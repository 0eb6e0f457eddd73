"""Sketch-aggregate semantics (functions/sketches.py): KMV exact/estimate
branches and error regime, CMS no-undercount invariant and
collision-free exactness, event-funnel ordering logic. The cross-engine
value parity of the driver queries rides test_queries_oracle.py; these
pin the sketch MATH."""

import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.sketches import (
    KMV_MAX,
    cms_lookup,
    cms_table,
    kmv_distinct,
)


def test_kmv_exact_branch_below_k(spark):
    # 10 distinct values, k=32 -> the sketch must report exactly 10
    df = spark.createDataFrame(
        [("g", i % 10) for i in range(100)], "grp string, v int"
    )
    out = kmv_distinct(df, ["grp"], "v", k=32).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_exact == 10
    assert row.kmv_estimate == 10


def test_kmv_estimate_branch_error_regime(spark):
    # 5000 distinct values, k=64: standard error ~ 1/sqrt(k-2) ~ 12.7%;
    # the md5 grid is deterministic, so this asserts the realised error
    # of one fixed draw, bounded at 4 sigma.
    n = 5000
    df = spark.createDataFrame([(v,) for v in range(n)], "v int").withColumn(
        "grp", F.lit("g")
    )
    row = kmv_distinct(df, ["grp"], "v", k=64).collect()[0]
    assert row.n_exact == n
    assert row.kmv_estimate != n  # it IS an estimate
    assert abs(row.kmv_estimate - n) / n < 4 / (64 - 2) ** 0.5
    # estimator formula holds exactly: (k-1) * M div h_k
    assert row.kmv_estimate == (63 * KMV_MAX) // row.kth_min


def test_kmv_insensitive_to_duplicates_and_grouping(spark):
    # duplicates of the same value must not move the sketch
    base = [("a", v) for v in range(200)] + [("b", v) for v in range(40)]
    once = spark.createDataFrame(base, "grp string, v int")
    thrice = spark.createDataFrame(base * 3, "grp string, v int")
    r1 = {r.grp: (r.kth_min, r.kmv_estimate) for r in kmv_distinct(once, ["grp"], "v").collect()}
    r3 = {r.grp: (r.kth_min, r.kmv_estimate) for r in kmv_distinct(thrice, ["grp"], "v").collect()}
    assert r1 == r3
    # group b has 40 distinct (> k=32): estimate branch, close to truth
    assert abs(r1["b"][1] - 40) <= 10
    assert set(r1) == {"a", "b"}


def test_cms_never_undercounts_and_exact_when_wide(spark):
    counts = spark.createDataFrame(
        [(f"k{i}", i + 1) for i in range(300)], "key string, cnt long"
    )
    # narrow grid: collisions guaranteed (300 keys into 64 buckets)
    cms = cms_table(counts, "key", "cnt", depth=3, width=64)
    est = cms_lookup(counts, cms, "key", depth=3, width=64)
    rows = est.collect()
    assert len(rows) == 300
    assert all(r.cms_est >= r.cnt for r in rows)
    assert any(r.cms_est > r.cnt for r in rows)  # collisions really occur
    # wide grid: 300 keys into 4x8192 -> every depth-row collision for a
    # key must be dodged by at least one row; with d=4 the min is exact
    # for this fixed md5 draw
    cms_w = cms_table(counts, "key", "cnt", depth=4, width=8192)
    exact = cms_lookup(counts, cms_w, "key", depth=4, width=8192).collect()
    assert all(r.cms_est == r.cnt for r in exact)


def test_cms_grid_is_bounded(spark):
    counts = spark.createDataFrame(
        [(f"k{i}", 1) for i in range(500)], "key string, cnt long"
    )
    grid = cms_table(counts, "key", "cnt", depth=4, width=32).collect()
    assert len(grid) <= 4 * 32
    total = sum(r.cms_count for r in grid)
    assert total == 4 * 500  # mass conservation: each key lands once per row


def test_event_funnel_ordering_logic(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # u1: full ordered funnel view(0) -> click(10) -> purchase(30)
        (1, s(0), "view"), (1, s(10), "click"), (1, s(30), "purchase"),
        # u2: click BEFORE view, purchase after view but no click after view
        (2, s(0), "click"), (2, s(5), "view"), (2, s(9), "purchase"),
        # u3: view only
        (3, s(0), "view"),
        # u4: purchase then click then view (nothing in order)
        (4, s(0), "purchase"), (4, s(1), "click"), (4, s(2), "view"),
        # u5: view -> click, no purchase; second click later (ignored: min)
        (5, s(0), "view"), (5, s(4), "click"), (5, s(99), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    from lieu_spark.queries import q_event_funnel

    # call the query body against a stub load
    import lieu_spark.queries as Q

    orig = Q.load
    Q.load = lambda spark, sf_dir, name: df
    try:
        out = {r.stage: (r.n_users, r.sum_lag_s) for r in q_event_funnel(spark, "x").collect()}
    finally:
        Q.load = orig
    assert out["1_view"][0] == 5  # every user has a view
    assert out["2_click"] == (2, 10 + 4)  # u1 (lag 10) and u5 (lag 4)
    assert out["3_purchase"] == (1, 20)  # only u1, lag 30-10


def test_theta_sketch_estimates_track_truth(spark):
    from lieu_spark.functions.sketches import theta_pair_ops, theta_sketches

    # two groups with a planted 50% overlap: a = 0..999, b = 500..1499
    rows = [("a", v) for v in range(1000)] + [("b", v) for v in range(500, 1500)]
    df = spark.createDataFrame(rows, "grp string, v int")
    sk = theta_sketches(df, "grp", "v", k=128)
    out = theta_pair_ops(sk, "grp").collect()
    assert len(out) == 1
    r = out[0]
    assert r.nd_a == 1000 and r.nd_b == 1000
    # union = 1500, intersection = 500; k=128 -> rel std err ~ 1/sqrt(126)
    assert abs(r.theta_union_est - 1500) / 1500 < 0.4
    assert abs(r.theta_inter_est - 500) / 500 < 0.6


def test_theta_sketch_exact_below_k(spark):
    from lieu_spark.functions.sketches import theta_pair_ops, theta_sketches

    # both groups below k -> sketches are exact and so are the set ops
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 15)]
    df = spark.createDataFrame(rows, "grp string, v int")
    sk = theta_sketches(df, "grp", "v", k=32)
    r = theta_pair_ops(sk, "grp").collect()[0]
    assert r.theta_union_est == 15
    assert r.theta_inter_est == 5


def test_histogram_quantiles_exact_on_uniform_grid(spark):
    from lieu_spark.functions.sketches import histogram_quantiles

    # values 1..1000: with 256 buckets the interpolated quantile must be
    # within one bucket width (ceil(999/256)+... width = 4) of the truth
    df = spark.createDataFrame([("g", v) for v in range(1, 1001)], "grp string, v long")
    out = {r.pct: r for r in histogram_quantiles(df, ["grp"], "v", (50, 90, 99)).collect()}
    assert out[50].n == 1000
    for pct in (50, 90, 99):
        truth = pct * 10  # exact pct-quantile of 1..1000
        assert abs(out[pct].est - truth) <= 4, (pct, out[pct].est)


def test_histogram_quantiles_constant_column(spark):
    from lieu_spark.functions.sketches import histogram_quantiles

    # vmax == vmin -> width clamps to 1, single bucket, est == the value
    df = spark.createDataFrame([("g", 7)] * 50, "grp string, v long")
    out = histogram_quantiles(df, ["grp"], "v", (50, 99)).collect()
    assert all(r.est == 7 for r in out)


def test_kmv_merge_is_lossless(spark):
    from lieu_spark.functions.sketches import kmv_distinct, kmv_merge, kmv_synopses

    # 400 distinct values spread over 8 shards (each shard > k so every
    # child synopsis truncates): the rolled-up estimate must EQUAL the
    # direct whole-stream sketch — mergeability is structural.
    rows = [("g", v % 8, v) for v in range(400)]
    df = spark.createDataFrame(rows, "grp string, shard int, v int")
    syn = kmv_synopses(df, ["grp", "shard"], "v", k=32)
    merged = kmv_merge(syn, ["grp"], k=32).collect()[0]
    direct = kmv_distinct(df, ["grp"], "v", k=32).collect()[0]
    assert merged.kmv_estimate == direct.kmv_estimate
    assert merged.kth_min == direct.kth_min
    # the merged union is truncated (only retained hashes), yet >= k
    assert 32 <= merged.n_syn <= 8 * 32


def test_kmv_merge_exact_branch_when_no_child_truncates(spark):
    from lieu_spark.functions.sketches import kmv_distinct, kmv_merge, kmv_synopses

    # 20 distinct values over 4 shards, k=32: no child truncates, so the
    # merged union is the full distinct hash set and the exact branch
    # reports the true count.
    rows = [("g", v % 4, v) for v in range(20)]
    df = spark.createDataFrame(rows, "grp string, shard int, v int")
    syn = kmv_synopses(df, ["grp", "shard"], "v", k=32)
    merged = kmv_merge(syn, ["grp"], k=32).collect()[0]
    assert merged.n_syn == 20
    assert merged.kmv_estimate == 20
    assert merged.kmv_estimate == kmv_distinct(df, ["grp"], "v", k=32).collect()[0].kmv_estimate


def test_theta_pair_survives_empty_retained_side(spark):
    """A tiny exact sketch paired with a huge one whose theta is below
    every hash the tiny side retained must still emit the pair (ka=0),
    not silently drop it from the inner joins."""
    import hashlib

    from lieu_spark.functions.sketches import theta_pair_ops, theta_sketches

    def hv(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16) + 1

    huge = list(range(5000))
    theta = sorted(hv(v) for v in huge)[31]  # k=32 threshold of the huge side
    tiny = [v for v in range(10_000, 11_000) if hv(v) >= theta][:3]
    assert len(tiny) == 3  # P(hash < theta) ~ 32/5000, misses are plentiful
    rows = [("huge", v) for v in huge] + [("tiny", v) for v in tiny]
    df = spark.createDataFrame(rows, "grp string, v long")
    sk = theta_sketches(df, "grp", "v", k=32)
    out = theta_pair_ops(sk, "grp").collect()
    assert len(out) == 1  # the pair exists despite tiny's empty cut
    r = out[0]
    assert r.theta_inter_est == 0
    # union estimate tracks the huge side (tiny contributes nothing
    # below theta); standard KMV error at k=32 is ~18%, allow 3 sigma
    assert abs(r.theta_union_est - 5003) < 0.55 * 5003


def test_kmv_ignores_null_values(spark):
    """NULL values must not enter the bottom-k: Spark windows rank NULL
    FIRST (asc nulls-first) which would corrupt kth_min and diverge from
    SQL engines' NULLS LAST."""
    from lieu_spark.functions.sketches import kmv_distinct, theta_sketches

    rows = [("g", str(v)) for v in range(10)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "grp string, v string")
    r = kmv_distinct(df, ["grp"], "v", k=32).collect()[0]
    assert r.n_exact == 10 and r.kmv_estimate == 10
    assert r.kth_min is not None
    sk = theta_sketches(df, "grp", "v", k=32).collect()
    assert len(sk) == 10 and all(s.hv is not None for s in sk)


def test_cms_lookup_non_build_key_reads_zero(spark):
    # the grid is sparse (untouched counters never materialized): a probe
    # key absent from the build set must estimate 0 (all buckets empty)
    # or a small collision count — never vanish from the output
    counts = spark.createDataFrame(
        [(f"k{i}", i + 1) for i in range(50)], "key string, cnt long"
    )
    cms = cms_table(counts, "key", "cnt", depth=4, width=8192)
    probes = spark.createDataFrame(
        [("k0",), ("never-seen-a",), ("never-seen-b",)], "key string"
    )
    rows = {r.key: r.cms_est for r in cms_lookup(probes, cms, "key", depth=4, width=8192).collect()}
    assert set(rows) == {"k0", "never-seen-a", "never-seen-b"}
    assert rows["k0"] == 1
    # wide grid -> overwhelmingly likely every probe bucket is untouched
    assert rows["never-seen-a"] == 0
    assert rows["never-seen-b"] == 0


def test_histogram_quantiles_ignore_nulls(spark):
    from lieu_spark.functions.sketches import histogram_quantiles

    # quantiles are over PRESENT values: padding the frame with NULLs
    # must not move any estimate (nulls used to rank first in the
    # cumulative window AND inflate n)
    clean = spark.createDataFrame(
        [("g", v) for v in range(1, 101)], "grp string, v long"
    )
    dirty = clean.unionByName(
        spark.createDataFrame([("g", None)] * 40, "grp string, v long")
    )
    a = {r.pct: (r.n, r.est) for r in histogram_quantiles(clean, ["grp"], "v").collect()}
    b = {r.pct: (r.n, r.est) for r in histogram_quantiles(dirty, ["grp"], "v").collect()}
    assert a == b
    assert a[50][0] == 100


def test_histogram_quantiles_null_group_kept(spark):
    from lieu_spark.functions.sketches import histogram_quantiles

    # a NULL GROUP key (vs NULL values, dropped above) is a group like
    # any other: the stats row exists, and the null-safe join-back must
    # not silently vacate its rows — it emits the same quantiles a
    # non-null group with identical values does
    df = spark.createDataFrame(
        [(None, v) for v in range(1, 101)] + [("g", v) for v in range(1, 101)],
        "grp string, v long",
    )
    out = histogram_quantiles(df, ["grp"], "v", (50, 90))
    rows = out.collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.grp, {})[r.pct] = (r.n, r.est)
    assert set(by_grp) == {None, "g"}
    assert by_grp[None] == by_grp["g"]


def test_sketch_k_must_be_at_least_two(spark):
    from lieu_spark.functions.sketches import (
        kmv_merge,
        kmv_synopses,
        theta_sketches,
    )

    df = spark.createDataFrame([("g", 1)], "grp string, v int")
    with pytest.raises(ValueError, match=">= 2"):
        kmv_distinct(df, ["grp"], "v", k=1)
    with pytest.raises(ValueError, match=">= 2"):
        kmv_synopses(df, ["grp"], "v", k=1)
    with pytest.raises(ValueError, match=">= 2"):
        kmv_merge(df.withColumnRenamed("v", "hv"), ["grp"], k=1)
    with pytest.raises(ValueError, match=">= 2"):
        theta_sketches(df, "grp", "v", k=1)
