"""operators/rangejoin.py — bucketed interval join vs a brute oracle.

The bucketization must be invisible: inclusive bounds, windows that
straddle a bucket boundary, negative timestamps (pmod-floor), negative
lo/hi (look-back windows), and a width-1 degenerate window. The plan
must stay an equi-join — no nested-loop fallback."""

import random

import pytest
from pyspark.sql import functions as F

from lieu_spark.operators.rangejoin import interval_join


def _brute(left, right, lo, hi):
    out = []
    for k, lts, pid in left:
        for k2, rts, rid in right:
            if k == k2 and lts + lo <= rts <= lts + hi:
                out.append((k, lts, pid, rts, rid))
    return sorted(out)


def _run(spark, left, right, lo, hi):
    ldf = spark.createDataFrame(left, "key int, ts_us long, pid int")
    rdf = spark.createDataFrame(right, "key int, ts_us long, rid int")
    res = interval_join(ldf, rdf, on=["key"], ts_col="ts_us", lo=lo, hi=hi)
    return sorted(
        (r["key"], r["ts_us"], r["pid"], r["r_ts_us"], r["r_rid"])
        for r in res.collect()
    )


@pytest.mark.parametrize(
    "lo,hi",
    [(-100, 0), (0, 100), (-50, 50), (-100, -10), (7, 7), (0, 1)],
)
def test_interval_join_matches_brute(spark, lo, hi):
    rng = random.Random(1234)
    # negative and positive timestamps, clustered so windows overlap
    left = [(rng.randrange(3), rng.randrange(-300, 300), i) for i in range(120)]
    right = [(rng.randrange(3), rng.randrange(-300, 300), i) for i in range(120)]
    assert _run(spark, left, right, lo, hi) == _brute(left, right, lo, hi)


def test_interval_join_rejects_inverted_bounds(spark):
    ldf = spark.createDataFrame([(1, 0, 0)], "key int, ts_us long, pid int")
    with pytest.raises(ValueError):
        interval_join(ldf, ldf, on=["key"], ts_col="ts_us", lo=5, hi=-5)


def test_interval_join_equi_join_plan(spark):
    """Scale contract: the range condition must ride an equi-join on
    (key, bucket) — never a nested-loop/cartesian over key groups."""
    ldf = spark.createDataFrame([(1, 0, 0)], "key int, ts_us long, pid int")
    rdf = spark.createDataFrame([(1, 0, 1)], "key int, ts_us long, rid int")
    plan = (
        interval_join(ldf, rdf, on=["key"], ts_col="ts_us", lo=-10, hi=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "_bucket" in plan  # joining on the quantized key


def test_interval_join_epoch_micros_magnitude(spark):
    """Exactness at real epoch-microsecond magnitudes (~1.7e15): a row
    exactly ON each inclusive bound must match; one past must not."""
    base = 1_704_067_200_000_000  # 2024-01-01 in epoch micros
    lo, hi = -259_200_000_000, 0
    left = [(1, base, 0)]
    right = [
        (1, base + lo, 10),      # exactly on the lower bound -> in
        (1, base + lo - 1, 11),  # one microsecond too old -> out
        (1, base, 12),           # on the upper bound -> in
        (1, base + 1, 13),       # one past -> out
    ]
    got = _run(spark, left, right, lo, hi)
    assert [g[4] for g in got] == [10, 12]
