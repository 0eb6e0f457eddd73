"""operators/asof.py — semantics vs a brute-force python oracle.

Covers the contract corners the union+window composition must get right:
equal-timestamp inclusivity (inclusive vs strict), duplicate build
timestamps (greatest-tiebreak wins), probe rows before any build row
(left-join NULLs), and row atomicity when a build payload field is NULL
(the whole winning row's fields, never a stitch of two rows).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lieu_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _brute(probe, build, strict):
    """probe/build: lists of dicts with key, ts, and payload."""
    out = []
    for p in probe:
        cands = [
            b
            for b in build
            if b["key"] == p["key"]
            and (b["ts"] < p["ts"] if strict else b["ts"] <= p["ts"])
        ]
        best = max(cands, key=lambda b: (b["ts"], b["tb"])) if cands else None
        out.append((p["key"], p["ts"], p["pid"], best and best["tb"]))
    return sorted(out, key=lambda r: (r[0], r[2]))


def _run(spark, probe, build, strict):
    pdf = spark.createDataFrame(
        [(p["key"], p["ts"], p["pid"]) for p in probe], "key int, ts timestamp, pid int"
    )
    bdf = spark.createDataFrame(
        [(b["key"], b["ts"], b["tb"]) for b in build], "key int, ts timestamp, tb int"
    )
    res = asof_join(pdf, bdf, on=["key"], ts_col="ts", strict=strict, tiebreak="tb")
    return sorted(
        ((r["key"], r["ts"], r["pid"], r["b_tb"]) for r in res.collect()),
        key=lambda r: (r[0], r[2]),
    )


PROBE = [
    {"key": 1, "ts": _ts(0), "pid": 0},   # before any build row -> NULL
    {"key": 1, "ts": _ts(10), "pid": 1},  # exactly ON a build ts
    {"key": 1, "ts": _ts(15), "pid": 2},  # between build rows
    {"key": 1, "ts": _ts(20), "pid": 3},  # ON a duplicated build ts
    {"key": 2, "ts": _ts(99), "pid": 4},  # key with no build rows at all
]
BUILD = [
    {"key": 1, "ts": _ts(10), "tb": 100},
    {"key": 1, "ts": _ts(20), "tb": 200},
    {"key": 1, "ts": _ts(20), "tb": 201},  # duplicate ts: greatest tb wins
    {"key": 1, "ts": _ts(30), "tb": 300},
]


@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_brute(spark, strict):
    assert _run(spark, PROBE, BUILD, strict) == _brute(PROBE, BUILD, strict)


def test_asof_row_atomicity_with_null_payload(spark):
    """A newer build row with a NULL payload field must win as a row —
    per-column last(ignorenulls) would resurrect the older row's value."""
    pdf = spark.createDataFrame([(1, _ts(50), 0)], "key int, ts timestamp, pid int")
    bdf = spark.createDataFrame(
        [(1, _ts(10), 7, "old"), (1, _ts(20), 8, None)],
        "key int, ts timestamp, tb int, note string",
    )
    row = asof_join(pdf, bdf, on=["key"], ts_col="ts", tiebreak="tb").collect()[0]
    assert row["b_tb"] == 8 and row["b_note"] is None
    assert row["b_ts"] == _ts(20)


def test_asof_single_shuffle_plan(spark):
    """Scale contract: exactly one Exchange (the window's key partition) —
    no range-join candidate explosion, no extra sort-merge shuffles."""
    pdf = spark.createDataFrame([(1, _ts(1), 0)], "key int, ts timestamp, pid int")
    bdf = spark.createDataFrame([(1, _ts(0), 5)], "key int, ts timestamp, tb int")
    plan = (
        asof_join(pdf, bdf, on=["key"], ts_col="ts", tiebreak="tb")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_null_build_ts_never_matches(spark):
    # a build row with NULL event time would sort nulls-first to the
    # partition head and become the carried match for every probe —
    # it must be invisible instead
    from lieu_spark.operators.asof import asof_join

    build = spark.createDataFrame(
        [("k", None, "ghost"), ("k", 3, "real")], "key string, ts long, v string"
    )
    probe = spark.createDataFrame(
        [("k", 1), ("k", 5)], "key string, ts long"
    )
    rows = {r.ts: r for r in asof_join(probe, build, ["key"]).collect()}
    assert rows[5].b_v == "real" and rows[5].b_ts == 3
    assert rows[1].b_v is None and rows[1].b_ts is None  # nothing as-of ts=1
