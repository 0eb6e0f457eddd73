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
which is tiny by construction — only texts recurring in >= min_df
distinct conversations survive the HAVING — then a BROADCAST left-anti
join drops matching turns. No self-join, no window over the corpus, no
Python, and the big side is touched exactly twice (once to count, once
to filter), both full scans a 1000-executor cluster does in parallel.
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
    so index gaps are harmless. The boilerplate set rides a broadcast
    left-anti join: the only shuffle is the counting aggregation."""
    boiler = boilerplate_turns(turns, min_df, conv_col, text_col).select(text_col)
    return turns.join(F.broadcast(boiler), text_col, "left_anti")
