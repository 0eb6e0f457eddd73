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
    # junk rows the batch choke point drops: the stream must drop them
    # too (a null turn_idx used to arrive as NaN and kill the query)
    some_ts = rows[0].ts
    dump(
        [
            corpus.TurnRow("zz-null-idx", None, "user", "x", "", some_ts),
            corpus.TurnRow(None, 0, "user", "y", "", some_ts),
            corpus.TurnRow("zz-null-ts", 0, "user", "z", "", None),
        ],
        "b2n",
    )
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
    # the junk rows must have been dropped, not assembled
    assert "zz-null-idx" not in got
    assert "zz-null-ts" not in got


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the assembler
    function without a streaming query."""

    def __init__(self):
        self.hasTimedOut = False
        self.exists = False
        self._t = None

    @property
    def get(self):
        return self._t

    def update(self, t):
        self._t = t
        self.exists = True

    def remove(self):
        self._t = None
        self.exists = False

    def setTimeoutTimestamp(self, ts):
        self._timeout = ts

    def getCurrentWatermarkMs(self):
        return 0


def test_stateful_assembler_collision_and_null_text_deterministic():
    """Duplicate (conv_id, turn_idx) rows with conflicting text must
    resolve identically regardless of arrival order (the batch
    assembler's min-struct winner), and a null text must assemble as ''
    (the batch choke-point convention)."""
    import pandas as pd

    from lieu_spark.streaming.stateful import make_assembler

    asm = make_assembler()

    def run(texts, roles=None):
        st = _FakeState()
        pdf = pd.DataFrame(
            {
                "turn_idx": [0, 1, 1],
                "text": texts,
                "role": roles or ["user"] * 3,
                "tool": [None] * 3,
                "ts": pd.to_datetime(["2026-01-01 00:00:00"] * 3),
            }
        )
        list(asm(("c",), iter([pdf]), st))
        st.hasTimedOut = True
        out = list(asm(("c",), iter([]), st))
        return out[0].iloc[0]

    a = run([None, "b", "a"])
    b = run([None, "a", "b"])
    assert a.doc == b.doc == "\na"  # null turn -> '', collision -> min
    assert a.text_sha == b.text_sha
    assert a.n_turns == 2


def test_stateful_collision_winner_matches_batch_struct_order(spark):
    """Conflicting duplicates that differ in ROLE: the batch assembler
    keeps the LOWEST struct(turn_idx, role, text, tool, ts) — role
    compares BEFORE text, so the 'assistant' row wins even when its
    text sorts higher. The stream used min(text) and diverged; the two
    paths must emit the same doc/text_sha."""
    import pandas as pd

    from lieu_spark.streaming.stateful import make_assembler

    rows = [
        ("c", 0, "user", "hello", None, None),
        ("c", 1, "assistant", "zzz wins on role", None, None),
        ("c", 1, "user", "aaa loses on role", None, None),
    ]
    tdf = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    batch = assemble_conversations(tdf).select("doc", "text_sha").collect()[0]
    assert "zzz wins on role" in batch.doc

    asm = make_assembler()
    st = _FakeState()
    pdf = pd.DataFrame(
        {
            "turn_idx": [0, 1, 1],
            "text": ["hello", "zzz wins on role", "aaa loses on role"],
            "role": ["user", "assistant", "user"],
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2026-01-01 00:00:00"] * 3),
        }
    )
    list(asm(("c",), iter([pdf]), st))
    st.hasTimedOut = True
    out = list(asm(("c",), iter([]), st))[0].iloc[0]
    assert out.doc == batch.doc
    assert out.text_sha == batch.text_sha
