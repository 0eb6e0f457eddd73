"""As-of (point-in-time) join as a single-shuffle DataFrame composition.

For every probe row, attach the newest build row with the same key whose
event time is <= (inclusive, the default — DuckDB/kdb ASOF semantics) or
< (``strict=True``) the probe row's event time; probe rows with no such
build row keep NULL build columns (LEFT ASOF).

The reference has no temporal operators (its data is static venue
records); this is one of the task brief's "operators Spark lacks"
implemented as a composition of existing DataFrame ops:

  1. tag both sides and union them into one stream of (key, ts, side,
     probe-payload | build-payload) rows;
  2. one window per key ordered by (ts, side, build tie-break) carries
     the last build payload forward (``F.last(ignorenulls=True)``);
  3. keep the probe rows.

Scale shape: exactly ONE shuffle (the window's partitionBy on the key
columns) regardless of build-side fan-in — there is no range-join
candidate explosion (a naive ``probe.ts >= build.ts`` join is O(|probe|
x |build|/keys) before the argmax; this is O(|probe| + |build|) after
the sort). The per-key window is sequential, so a pathologically hot
key serializes; the standard mitigation (coarse time-bucket pre-split
with per-bucket boundary carry) can be layered on top without changing
this operator's contract.

Row atomicity: the build payload is carried as ONE struct column, so a
build row whose individual payload fields are NULL still wins as a unit
— per-column ``last(ignorenulls)`` would silently stitch fields from
DIFFERENT build rows.

Tie rules (both deterministic and oracle-matched):
  - probe.ts == build.ts: inclusive mode sees the build row, strict
    mode does not (side ordering does this; no extra filter);
  - several build rows share (key, ts): the one with the greatest
    ``tiebreak`` column wins (callers that need engine-portable results
    should pre-dedupe the build side per (key, ts) — DuckDB's ASOF
    picks an unspecified row on such ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE_PROBE = 1


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    build_cols: list[str] | None = None,
    prefix: str = "b_",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """LEFT as-of join: probe columns + ``prefix``-renamed build columns
    (including ``prefix + ts_col`` = the matched build row's event time).

    ``build_cols`` defaults to every build column except ``on`` +
    ``ts_col``. ``tiebreak`` (a build column, default: first payload
    column) breaks equal-(key, ts) build rows by greatest value.
    """
    if build_cols is None:
        build_cols = [c for c in build.columns if c not in (*on, ts_col)]
    if tiebreak is None and build_cols:
        tiebreak = build_cols[0]

    probe_payload = [c for c in probe.columns if c not in (*on, ts_col)]
    payload_struct = F.struct(
        F.col(ts_col).alias(prefix + ts_col),
        *[F.col(c).alias(prefix + c) for c in build_cols],
    )
    # a build row with NULL event time can never be "as of" anything,
    # but Spark's asc() default is nulls FIRST — unfiltered it would sit
    # at the partition head and become the carried match for probes
    # that should report no match
    build = build.filter(F.col(ts_col).isNotNull())
    # inclusive: build(0) sorts before probe(1) at equal ts -> visible;
    # strict: build(2) sorts after probe(1) -> not visible.
    build_side = 2 if strict else 0
    b = build.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(build_side).alias("_side"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_payload],
        payload_struct.alias("_b"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
    )
    p = probe.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(_SIDE_PROBE).alias("_side"),
        *probe_payload,
        F.lit(None).cast(b.schema["_b"].dataType).alias("_b"),
        F.lit(None).cast(b.schema["_tb"].dataType).alias("_tb"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        b.unionByName(p)
        .withColumn("_match", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("_side") == _SIDE_PROBE)
    )
    return matched.select(
        *on,
        ts_col,
        *probe_payload,
        *[F.col("_match." + prefix + c).alias(prefix + c) for c in (ts_col, *build_cols)],
    )
