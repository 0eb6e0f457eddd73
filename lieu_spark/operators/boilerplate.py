"""Boilerplate-turn removal — the line-dedup step of corpus curation.

Web-scale curation pipelines strip lines that recur verbatim across
many documents (navigation chrome, cookie banners, legal footers); the
transcript analog is the turn repeated across conversations — canned
greetings, disclaimers, system preambles — which a trained model would
otherwise see at boosted frequency. Reference analog: lieu deduplicates
whole records (lib/lieu/dedupe.py:64-102 operates on full assembled
names/addresses); sub-record boilerplate is beyond its scope and is
added here as part of the training-data funnel.

Scale shape: ONE aggregation over the turn text (two-phase
countDistinct with map-side partials) produces the boilerplate key set,
then a left-anti join on a FIXED-WIDTH 64-bit hash of the turn text
drops matching turns. The hash keeps the build side small regardless of
turn length (8 bytes per boilerplate text instead of the full string),
and the join strategy is deliberately left to the optimizer: AQE
converts to a broadcast anti-join at runtime when the boilerplate set
is small (the common case) and falls back to a shuffled anti-join when
a dup-heavy corpus inflates the set past the broadcast threshold — a
forced broadcast hint here would bypass autoBroadcastJoinThreshold and
risk driver OOM on exactly the corpora this engine targets. A 64-bit
hash collision would drop a non-boilerplate turn with probability
~|distinct texts|^2 / 2^64 — negligible, and deterministic either way.
No self-join, no window over the corpus, no Python, and the big side is
touched exactly twice (once to count, once to filter), both full scans
a 1000-executor cluster does in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_turns(
    turns: DataFrame,
    min_df: int = 2,
    conv_col: str = "conv_id",
    text_col: str = "turn_text",
) -> DataFrame:
    """Turn texts appearing in >= ``min_df`` distinct conversations,
    with their conversation counts. Empty text never counts as
    boilerplate (blank separator turns are formatting, not content)."""
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    return (
        turns.filter(F.col(text_col) != "")
        .groupBy(text_col)
        .agg(F.countDistinct(conv_col).alias("n_convs"))
        .filter(F.col("n_convs") >= min_df)
    )


def remove_boilerplate_turns(
    turns: DataFrame,
    min_df: int = 2,
    conv_col: str = "conv_id",
    text_col: str = "turn_text",
) -> DataFrame:
    """Drop every turn whose text is boilerplate (shared by >= min_df
    conversations); all other turns keep their conversation id and
    ``turn_idx`` unchanged — downstream assembly orders by ``turn_idx``,
    so index gaps are harmless. The anti-join key is xxhash64 of the
    turn text (fixed-width build side) and the strategy is left to the
    optimizer: AQE broadcasts a small set, shuffles a large one (see
    module docstring)."""
    boiler = boilerplate_turns(turns, min_df, conv_col, text_col).select(
        F.xxhash64(text_col).alias("_bp_h")
    )
    return (
        turns.withColumn("_bp_h", F.xxhash64(text_col))
        .join(boiler, "_bp_h", "left_anti")
        .drop("_bp_h")
    )
