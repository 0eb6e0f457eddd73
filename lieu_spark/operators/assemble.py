"""Turn rows -> assembled conversation documents.

The reference's analog is ``Address.from_geojson`` normalization of one
input record (/root/reference/lib/lieu/address.py:171-187); our input is
*multi-row* per logical record (one row per turn), so assembly is a
deterministic grouped aggregation under stable turn ordering
(BASELINE.json input_hint: window over conv_id ordered by turn_idx,
preserving per-turn text equality).

We use ``array_sort(collect_list(struct(turn_idx, ...)))`` rather than a
Window + collect_list: one shuffle, no window state, deterministic
regardless of input row order or partitioning. Duplicate (conv_id,
turn_idx) input rows are dropped first (idempotent ingest — property test
in tests/test_invariants.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEP = "\n"


def assemble_conversations(transcripts: DataFrame, keep_turns: bool = False) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) -> one row per conv:

    conv_id, n_turns, doc (turn texts joined in turn_idx order),
    text_sha (sha2-256 of doc — the exact-dup key), first_ts/last_ts,
    and (keep_turns=True only) the full ordered turns array<struct>.

    keep_turns defaults off: nothing downstream needs the struct array
    once ``doc`` exists, and carrying it doubles the text volume of the
    persisted/checkpointed conversations table.
    """
    deduped = transcripts.dropDuplicates(["conv_id", "turn_idx"])
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("turn_idx"),
                F.col("role"),
                F.col("text"),
                F.col("tool"),
                F.col("ts"),
            )
        )
    )
    out = deduped.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        turns.alias("turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    doc = F.concat_ws(
        TURN_SEP, F.transform(F.col("turns"), lambda t: t["text"])
    )
    out = out.withColumn("doc", doc).withColumn("text_sha", F.sha2(F.col("doc"), 256))
    if not keep_turns:
        out = out.drop("turns")
    return out
