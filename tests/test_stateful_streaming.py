"""Cross-batch stateful assembly: turns of one conversation arriving in
different micro-batches must still assemble into the exact batch-path
doc + sha (applyInPandasWithState with event-time timeout)."""

from datetime import timedelta

import pytest

from lieu_spark import corpus
from lieu_spark.operators.assemble import assemble_conversations
from lieu_spark.streaming.stateful import assemble_stream


@pytest.mark.slow
def test_cross_batch_assembly_matches_batch_path(spark, tmp_path):
    in_dir = tmp_path / "turns"
    out_dir = tmp_path / "out"
    in_dir.mkdir()

    rows = corpus.generate_rows(42, 6)
    # split each conversation's turns across two files (= two
    # micro-batches with maxFilesPerTrigger=1)
    first = [r for r in rows if r.turn_idx % 2 == 0]
    second = [r for r in rows if r.turn_idx % 2 == 1]

    def dump(batch, name):
        spark.createDataFrame(
            [(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in batch],
            corpus.TRANSCRIPT_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(str(in_dir / name))

    dump(first, "b1")
    dump(second, "b2")
    # watermark flusher: one dummy turn far in the future pushes the
    # watermark past every real conversation's timeout
    flush_ts = max(r.ts for r in rows) + timedelta(hours=2)
    dump(
        [corpus.TurnRow("zzflush", 0, "user", "flush", "", flush_ts)],
        "b3",
    )

    stream = (
        spark.readStream.schema(corpus.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = (
        assemble_stream(stream, watermark="1 minute", gap_ms=60_000)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r.conv_id: (r.n_turns, r.doc, r.text_sha)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # every real conversation must be emitted exactly as the batch path
    # assembles it (the flusher may or may not have timed out yet)
    batch = assemble_conversations(
        spark.createDataFrame(
            [(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in rows],
            corpus.TRANSCRIPT_SCHEMA,
        )
    )
    want = {
        r.conv_id: (r.n_turns, r.doc, r.text_sha) for r in batch.collect()
    }
    for cid, triple in want.items():
        assert got.get(cid) == triple, cid
