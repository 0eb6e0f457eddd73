"""Structured-Streaming incremental ingest: batches arriving over time
dedupe against the growing canonical index (S8 batch-over-batch parity,
reference lib/lieu/spark/tfidf.py:43-45)."""

import pytest

from lieu_spark import corpus
from lieu_spark.config import DedupeConfig
from lieu_spark.streaming.ingest import run_stream

CFG = DedupeConfig()


@pytest.mark.slow
def test_incremental_stream_dedupe(spark, tmp_path):
    in_dir = tmp_path / "incoming"
    work = tmp_path / "work"
    in_dir.mkdir()

    # batch 1: conversations 0..39 (contains its own planted dupes)
    b1 = corpus.generate_df(spark, 42, 40)
    b1.coalesce(1).write.mode("append").parquet(str(in_dir))
    run_stream(spark, str(in_dir), str(work), CFG, available_now=True)

    index1 = spark.read.parquet(f"{work}/index")
    n1 = index1.count()
    assert 0 < n1 <= 40  # exact in-batch copies may collapse later; index appended

    # batch 2: exact copies of convs 0..9 under new ids -> must match
    rows = [r for r in corpus.generate_rows(42, 10)]
    dup_rows = [
        (f"z{int(r.conv_id[1:]):09d}", r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in rows
    ]
    spark.createDataFrame(dup_rows, corpus.TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    run_stream(spark, str(in_dir), str(work), CFG, available_now=True)

    pairs = spark.read.parquet(f"{work}/pairs")
    matched = {
        (r.id_a, r.id_b)
        for r in pairs.filter("status = 'exact_duplicate'").collect()
    }
    for i in range(10):
        assert (corpus.conv_id_str(i), f"z{i:09d}") in matched, sorted(matched)[:5]

    # dupes must NOT have been folded into the index
    index2 = spark.read.parquet(f"{work}/index")
    zs = [r.conv_id for r in index2.collect() if r.conv_id.startswith("z")]
    assert zs == []
