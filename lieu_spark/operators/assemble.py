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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_SEP = "\n"


def assemble_conversations(
    transcripts: DataFrame,
    keep_turns: bool = False,
    max_turns: int | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) -> one row per conv:

    conv_id, n_turns, doc (turn texts joined in turn_idx order),
    text_sha (sha2-256 of doc — the exact-dup key), first_ts/last_ts,
    and (keep_turns=True only) the full ordered turns array<struct>.

    keep_turns defaults off: nothing downstream needs the struct array
    once ``doc`` exists, and carrying it doubles the text volume of the
    persisted/checkpointed conversations table.

    ``max_turns`` bounds the per-conversation aggregation state: keep
    only the max_turns LOWEST turn_idx rows (deterministic prefix). This
    is the assembly-stage analog of hot_band_cap / span_max_chars — a
    single pathological conversation with millions of turns would
    otherwise materialize an unbounded collect_list buffer and a
    GB-sized doc on one executor. The rank window partitions by conv_id,
    the same key as the groupBy, so capping adds no extra exchange
    (the window's shuffle is reused). Capped conversations are flagged
    ``truncated`` for the metrics table.

    Rows with a null conv_id or null turn_idx are dropped HERE, at the
    shared choke point every ingest path funnels through: a null
    turn_idx has no stable position in the assembled doc (struct-sort
    placement is an implementation detail), so keeping such rows would
    make text_sha — and therefore every dedupe verdict — depend on
    which ingest path a conversation arrived through. The per-source
    filters (coalesce_aliases, parse_transcript_lines) apply the same
    policy earlier as an optimization, but this is where it is
    guaranteed.
    """
    transcripts = transcripts.filter(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    )
    # Null text is normalized to "" HERE, at the same choke point: CSV
    # cannot represent empty-vs-null (Spark's reader conflates them),
    # and concat_ws SKIPS nulls but keeps empties — without this
    # coalesce a multi-turn conv with one empty turn would get a
    # different doc (and text_sha, and exact-dup verdict) depending on
    # which ingest format it arrived through.
    struct_cols = F.struct(
        F.col("turn_idx"),
        F.col("role"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.col("tool"),
        F.col("ts"),
    )
    if max_turns is not None:
        # cap path: rank-filter BEFORE the aggregation so a pathological
        # conversation never materializes an unbounded collect_list
        # buffer; dropDuplicates first so ranks count distinct turns.
        # Both window and groupBy key on conv_id — the exchange is
        # shared.
        deduped = transcripts.dropDuplicates(["conv_id", "turn_idx"])
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        deduped = (
            deduped.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "_total", F.count("*").over(Window.partitionBy("conv_id"))
            )
            .filter(F.col("_rn") <= max_turns)
        )
        out = deduped.groupBy("conv_id").agg(
            F.count("*").alias("n_turns"),
            F.array_sort(F.collect_list(struct_cols)).alias("turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            (F.max("_total") > max_turns).alias("truncated"),
        )
    else:
        # default path: ONE shuffle. Duplicate (conv_id, turn_idx) rows
        # are dropped inside the aggregation — array_sort puts the
        # lowest struct first per turn_idx, and the index-filter keeps
        # each turn_idx's first entry. Deterministic winner (lowest
        # full-struct value), unlike dropDuplicates' arbitrary row, and
        # the turns table shuffles once instead of twice.
        raw = F.array_sort(F.collect_list(struct_cols))
        out = transcripts.groupBy("conv_id").agg(raw.alias("_raw"))
        # eqNullSafe, not !=: a NULL turn_idx in the previous element would
        # make != yield NULL and silently drop the first non-null turn
        # (and diverge from the cap path, whose dropDuplicates treats
        # NULLs as equal).
        kept = F.filter(
            F.col("_raw"),
            lambda t, i: (i == F.lit(0))
            | ~t["turn_idx"].eqNullSafe(
                F.element_at(F.col("_raw"), i)["turn_idx"]
            ),
        )
        out = (
            out.withColumn("turns", kept)
            .drop("_raw")
            .withColumn("n_turns", F.size("turns").cast("long"))
            .withColumn(
                "first_ts",
                F.array_min(F.transform(F.col("turns"), lambda t: t["ts"])),
            )
            .withColumn(
                "last_ts",
                F.array_max(F.transform(F.col("turns"), lambda t: t["ts"])),
            )
        )
    doc = F.concat_ws(
        TURN_SEP, F.transform(F.col("turns"), lambda t: t["text"])
    )
    out = out.withColumn("doc", doc).withColumn("text_sha", F.sha2(F.col("doc"), 256))
    if not keep_turns:
        out = out.drop("turns")
    return out
