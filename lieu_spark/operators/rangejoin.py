"""Bounded range (interval) join as a bucketed equi-join.

Pairs every left row with the right rows sharing its key whose event
time falls in ``[l.ts + lo, l.ts + hi]`` (inclusive bounds). A naive
``l.key == r.key AND r.ts BETWEEN ...`` join degenerates to a per-key
nested loop (Catalyst keeps the equi-part but evaluates the range as a
post-filter over the whole key group — O(|L| x |R| / keys)); at 100 TB
with millions of rows per hot key that is the bottleneck.

Spark-first shape: quantize time into buckets of width ``W = hi - lo``.
Each right row lands in exactly one ``(key, bucket)``; each left row's
window ``[ts+lo, ts+hi]`` overlaps AT MOST TWO consecutive buckets, so
the left side explodes to <= 2 rows and the join becomes a plain
equi-join on ``(key, bucket)`` followed by the exact range filter.
Work is O(|L| + |R| + |matches|) after the shuffle, and — unlike an
as-of window — a hot key is SPLIT across its time buckets, so key skew
is diluted by time instead of serialized.

Timestamps are integral (epoch micros/seconds — caller converts; see
queries.q_range_join_events); bucket index uses pmod-floor so negative
epochs quantize correctly. The only division runs on an exact multiple
of the width, so the double quotient is an exact integer for
|epoch| < 2^53 (microseconds until year ~2255).

A pair can only match in the right row's own bucket (which occurs once
among the left row's <= 2 emitted buckets), so no dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(col: Column, w: int) -> Column:
    # (x - pmod(x, w)) is an exact multiple of w, so the double quotient
    # is an exact integer for |x| < 2^53 (pmod keeps negatives floor-like)
    exact = col - F.pmod(col, F.lit(w))
    return (exact / F.lit(w)).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    lo: int,
    hi: int,
    prefix: str = "r_",
) -> DataFrame:
    """Inner bounded-range join. ``ts_col`` must be an integral column on
    both sides; ``lo <= hi`` define the inclusive match window relative
    to the left row. Right columns (except the keys) come back
    ``prefix``-renamed. Zero-match left rows drop (inner semantics);
    re-attach with a left join on the caller's side when needed.
    """
    if lo > hi:
        raise ValueError(f"lo ({lo}) must be <= hi ({hi})")
    w = max(hi - lo, 1)
    lb = _floor_div(F.col(ts_col) + F.lit(lo), w)
    ub = _floor_div(F.col(ts_col) + F.lit(hi), w)
    l = left.withColumn("_bucket", F.explode(F.sequence(lb, ub)))
    r = right.select(
        *[F.col(c) for c in on],
        _floor_div(F.col(ts_col), w).alias("_bucket"),
        *[
            F.col(c).alias(prefix + c)
            for c in right.columns
            if c not in on
        ],
    )
    rts = F.col(prefix + ts_col)
    return (
        l.join(r, [*on, "_bucket"])
        .filter((rts >= F.col(ts_col) + F.lit(lo)) & (rts <= F.col(ts_col) + F.lit(hi)))
        .drop("_bucket")
    )
