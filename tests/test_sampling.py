"""functions/sampling.py — determinism, portability, and distribution.

The property that matters for training pipelines: assignment is a pure
function of (id, salt) — identical across partitionings, runs, and
engines (the md5 recipe is re-derived in pure python here, no Spark
code shared) — and subsamples nest (rate r1 < r2 => sample(r1) ⊆
sample(r2))."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lieu_spark.functions.sampling import (
    BUCKETS,
    deterministic_sample,
    hash_bucket,
    split_assign,
)


def _py_bucket(ident, salt=""):
    h = hashlib.md5((salt + str(ident)).encode()).hexdigest()
    return int(h[:15], 16) % BUCKETS


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 2000).select(F.col("id").cast("long"))


def test_bucket_matches_pure_python(spark, ids_df):
    rows = ids_df.select("id", hash_bucket(F.col("id"), "s1").alias("b")).collect()
    for r in rows:
        assert r["b"] == _py_bucket(r["id"], "s1")


def test_split_partition_invariant_and_sized(spark, ids_df):
    a = {
        r["id"]: r["split"]
        for r in ids_df.select("id", split_assign(F.col("id"), salt="x")).collect()
    }
    b = {
        r["id"]: r["split"]
        for r in ids_df.repartition(17)
        .select("id", split_assign(F.col("id"), salt="x"))
        .collect()
    }
    assert a == b
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_salt_gives_independent_resplit(spark, ids_df):
    a = [r["split"] for r in ids_df.select("id", split_assign(F.col("id"), salt="a")).orderBy("id").collect()]
    b = [r["split"] for r in ids_df.select("id", split_assign(F.col("id"), salt="b")).orderBy("id").collect()]
    agree = sum(1 for x, y in zip(a, b) if x == y) / len(a)
    # independent splits agree only by chance: 0.8^2 + 0.1^2 + 0.1^2 = 0.66
    assert 0.55 < agree < 0.77


def test_nested_subsamples(spark, ids_df):
    small = {r["id"] for r in deterministic_sample(ids_df, 0.1, "id", "s").collect()}
    big = {r["id"] for r in deterministic_sample(ids_df, 0.4, "id", "s").collect()}
    assert small <= big
    assert abs(len(big) / 2000 - 0.4) < 0.05


def test_bad_args_rejected(spark, ids_df):
    with pytest.raises(ValueError):
        split_assign(F.col("id"), weights={"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        deterministic_sample(ids_df, 1.5, "id")


def test_no_shuffle_no_udf_plan(spark, ids_df):
    """Scale contract: assignment is a pure projection — no Exchange, no
    Python UDF (BatchEvalPython/ArrowEvalPython) in the plan."""
    plan = (
        ids_df.select("id", split_assign(F.col("id")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_mixture_sample_rates_and_supersampling(spark):
    from lieu_spark.functions.sampling import mixture_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    kept = mixture_sample(df, {"a": 0.5, "b": 0.1}, "grp", "id", salt="m").collect()
    by = {}
    for r in kept:
        by.setdefault(r.grp, set()).add(r.id)
    # realized rates within hash tolerance
    assert 0.4 < len(by["a"]) / 1000 < 0.6
    assert 0.05 < len(by["b"]) / 1000 < 0.16
    # supersampling per group: raising a rate only ADDS rows
    kept2 = mixture_sample(df, {"a": 0.8, "b": 0.1}, "grp", "id", salt="m").collect()
    by2 = {}
    for r in kept2:
        by2.setdefault(r.grp, set()).add(r.id)
    assert by["a"] <= by2["a"]
    assert by["b"] == by2["b"]
    # default_rate applies to unlisted groups
    kept3 = mixture_sample(df, {"a": 0.5}, "grp", "id", salt="m", default_rate=0.0)
    assert kept3.filter("grp = 'b'").count() == 0


def test_corpus_shuffle_is_stable_permutation(spark, ids_df):
    from lieu_spark.functions.sampling import corpus_shuffle

    out = corpus_shuffle(ids_df, "id", salt="s", nshards=8)
    rows = out.collect()
    assert len(rows) == 2000
    # within every shard, pos is exactly 1..n (a permutation, no gaps)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # partition-invariant: identical placement after a reshuffle
    again = {
        (r.id): (r.shard, r.pos)
        for r in corpus_shuffle(
            ids_df.repartition(13), "id", salt="s", nshards=8
        ).collect()
    }
    assert {r.id: (r.shard, r.pos) for r in rows} == again
    # matches the pure-python re-derivation of the same recipe
    import hashlib as _h

    def key(i):
        return _h.md5(("s" + str(i)).encode()).hexdigest()

    expect = {}
    for s in range(8):
        members = sorted(
            (i for i in range(2000) if _py_bucket(i, "s") % 8 == s),
            key=lambda i: (key(i), i),
        )
        for p, i in enumerate(members, 1):
            expect[i] = (s, p)
    assert expect == {r.id: (r.shard, r.pos) for r in rows}


def test_corpus_shuffle_insert_preserves_relative_order(spark):
    from lieu_spark.functions.sampling import corpus_shuffle

    base = spark.range(0, 500).select(F.col("id").cast("long"))
    grown = spark.range(0, 1000).select(F.col("id").cast("long"))
    a = corpus_shuffle(base, "id", salt="g", nshards=4).collect()
    b = corpus_shuffle(grown, "id", salt="g", nshards=4).collect()
    pos_a = {r.id: (r.shard, r.pos) for r in a}
    pos_b = {r.id: (r.shard, r.pos) for r in b}
    # same shard always; within a shard, old rows keep their relative order
    for i in pos_a:
        assert pos_a[i][0] == pos_b[i][0]
    old = sorted(pos_a, key=lambda i: pos_a[i])
    old_in_new = sorted(pos_a, key=lambda i: pos_b[i])
    assert old == old_in_new


def test_corpus_shuffle_single_hash_exchange_plan(spark, ids_df):
    """Scale contract: one hash shuffle on shard (never a single-
    partition global sort), no Python UDF."""
    from lieu_spark.functions.sampling import corpus_shuffle

    plan = (
        corpus_shuffle(ids_df, "id", salt="s", nshards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert plan.lower().count("exchange hashpartitioning") == 1
    with pytest.raises(ValueError):
        corpus_shuffle(ids_df, "id", nshards=0)


def test_mixture_sample_validates_rates(spark):
    from lieu_spark.functions.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    with pytest.raises(ValueError):
        mixture_sample(df, {"a": 1.5}, "grp", "id")
    with pytest.raises(ValueError):
        mixture_sample(df, {"a": 0.5}, "grp", "id", default_rate=-0.1)


def _cap_reference(rows, cap, salt=""):
    """Pure-python twin of cap_per_group: first `cap` rows per group
    under the (md5 bucket, id) order. rows = [(id, group)]."""
    from collections import defaultdict

    by_g = defaultdict(list)
    for i, g in rows:
        by_g[g].append((_py_bucket(i, salt), i))
    kept = set()
    for g, members in by_g.items():
        for _, i in sorted(members)[:cap]:
            kept.add(i)
    return kept


def test_cap_per_group_matches_reference_incl_null_and_exact_fit(spark):
    from lieu_spark.functions.sampling import cap_per_group

    # groups: 'big' 40 rows (over cap), 'fit' exactly cap rows, 'small'
    # 3 rows (under cap), None group 7 rows (its own capped group)
    rows = (
        [(i, "big") for i in range(40)]
        + [(100 + i, "fit") for i in range(10)]
        + [(200 + i, "small") for i in range(3)]
        + [(300 + i, None) for i in range(7)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = {
        r.doc_id
        for r in cap_per_group(df, "grp", "doc_id", cap=10, salt="t").collect()
    }
    assert got == _cap_reference(rows, 10, "t")
    assert len([i for i, g in rows if g == "fit" and i in got]) == 10
    assert len([i for i, g in rows if g == "small" and i in got]) == 3
    assert len([i for i, g in rows if g is None and i in got]) == 7

    # partition invariance
    got7 = {
        r.doc_id
        for r in cap_per_group(
            df.repartition(7), "grp", "doc_id", cap=10, salt="t"
        ).collect()
    }
    assert got7 == got


def test_cap_per_group_nested_caps_and_edges(spark):
    from lieu_spark.functions.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    k5 = {r.doc_id for r in cap_per_group(df, "grp", "doc_id", 5).collect()}
    k12 = {r.doc_id for r in cap_per_group(df, "grp", "doc_id", 12).collect()}
    assert k5 < k12 and len(k5) == 15 and len(k12) == 36
    assert cap_per_group(df, "grp", "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", "doc_id", -1)


def test_global_cap_exact_k_and_nested(spark):
    from lieu_spark.functions.sampling import cap_per_group, global_cap

    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    k20 = {r.doc_id for r in global_cap(df, "doc_id", 20, "g").collect()}
    k50 = {r.doc_id for r in global_cap(df, "doc_id", 50, "g").collect()}
    assert len(k20) == 20 and len(k50) == 50 and k20 < k50
    # equals the pure-python (bucket, id) order prefix
    order = sorted((_py_bucket(i, "g"), i) for i in range(200))
    assert k20 == {i for _, i in order[:20]}
    # k beyond the corpus returns everything, no duplication
    assert global_cap(df, "doc_id", 500, "g").count() == 200


def _budget_reference(rows, budget, salt=""):
    """Pure-python twin of token_budget_select: maximal prefix of the
    (score DESC, md5 bucket, id) order with cumulative weight <= budget.
    rows = [(id, score, weight)]."""
    order = sorted(rows, key=lambda r: (-r[1], _py_bucket(r[0], salt), r[0]))
    kept, cum = set(), 0
    for i, _, w in order:
        if cum + w > budget:
            break
        cum += w
        kept.add(i)
    return kept


def test_token_budget_select_matches_reference_and_prefix(spark):
    from lieu_spark.functions.sampling import token_budget_select

    # scores deliberately collide (i % 7) so the boundary lands INSIDE a
    # score class and the level-2 bucket machinery does real work.
    rows = [(i, (i * 31) % 7, 1 + (i * 13) % 20) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score long, w long")
    total = sum(w for _, _, w in rows)
    for budget in (0, 37, total // 3, total // 2, total, total + 10):
        got = {
            r.doc_id
            for r in token_budget_select(
                df, "doc_id", "score", "w", budget, "tb"
            ).collect()
        }
        assert got == _budget_reference(rows, budget, "tb"), budget
    # nesting: smaller budget selects a prefix of the larger selection
    k1 = _budget_reference(rows, total // 3, "tb")
    k2 = _budget_reference(rows, total // 2, "tb")
    assert k1 <= k2
    # full budget = passthrough
    assert _budget_reference(rows, total, "tb") == {i for i, _, _ in rows}
    with pytest.raises(ValueError):
        token_budget_select(df, "doc_id", "score", "w", -1)


def test_token_budget_select_all_one_score_and_zero_weights(spark):
    from lieu_spark.functions.sampling import token_budget_select

    # one score class: level 1 keeps nothing wholesale, the whole
    # selection comes from the bucket boundary walk.
    rows = [(i, 5, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, score long, w long")
    got = {
        r.doc_id
        for r in token_budget_select(df, "doc_id", "score", "w", 333, "z").collect()
    }
    ref = _budget_reference(rows, 333, "z")
    assert got == ref and len(got) == 33
    # zero-weight rows: kept for free while the running total allows,
    # dropped once a crossing doc blocks the prefix.
    rows2 = [(0, 9, 0), (1, 9, 5), (2, 9, 0), (3, 9, 50), (4, 9, 0), (5, 1, 0)]
    df2 = spark.createDataFrame(rows2, "doc_id long, score long, w long")
    got2 = {
        r.doc_id
        for r in token_budget_select(df2, "doc_id", "score", "w", 10, "").collect()
    }
    assert got2 == _budget_reference(rows2, 10, "")
    # partition invariance
    got2b = {
        r.doc_id
        for r in token_budget_select(
            df2.repartition(5), "doc_id", "score", "w", 10, ""
        ).collect()
    }
    assert got2b == got2


def _temp_reference(rows, alpha, tf, salt=""):
    """Pure-python twin of temperature_sample. rows = [(id, group)].
    Mirrors the quantized-rate chain exactly (round = half-away-from-
    zero, same association order)."""
    import math
    from collections import Counter

    def _round(x):
        return int(math.floor(x + 0.5))

    n_by = Counter(g for _, g in rows)
    s_by = {g: _round((n ** alpha) * 1e9) for g, n in n_by.items()}
    N, S = sum(n_by.values()), sum(s_by.values())
    thr = {
        g: _round(min(1.0, tf * N / n_by[g] * s_by[g] / S) * BUCKETS)
        for g in n_by
    }
    return {i for i, g in rows if _py_bucket(i, salt) < thr[g]}, thr


def test_temperature_sample_matches_reference_and_reweights(spark):
    from lieu_spark.functions.sampling import temperature_sample

    # one dominant group, two rare ones (one tiny enough to clamp to 1)
    rows = (
        [(i, "en") for i in range(400)]
        + [(1000 + i, "fr") for i in range(50)]
        + [(2000 + i, "io") for i in range(4)]
        + [(3000 + i, None) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r.doc_id
        for r in temperature_sample(
            df, "lang", "doc_id", alpha=0.5, target_frac=0.4, salt="t"
        ).collect()
    }
    ref, thr = _temp_reference(rows, 0.5, 0.4, "t")
    assert got == ref
    # alpha<1 upsamples rare groups: per-group rate ordering inverts size
    assert thr["io"] > thr["fr"] > thr["en"]
    # the 4-row group is clamped to keep-everything
    assert thr["io"] == BUCKETS
    assert all(1000 + i not in got or True for i in range(50))
    # partition invariance
    got13 = {
        r.doc_id
        for r in temperature_sample(
            df.repartition(13), "lang", "doc_id", alpha=0.5, target_frac=0.4, salt="t"
        ).collect()
    }
    assert got13 == got


def test_temperature_sample_alpha_extremes_and_nesting(spark):
    from lieu_spark.functions.sampling import temperature_sample

    rows = [(i, "a") for i in range(300)] + [(500 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # alpha=1: plain proportional — every group keeps ~target_frac with
    # the SAME threshold (round(0.5 * 1e6))
    ref1, thr1 = _temp_reference(rows, 1.0, 0.5)
    got1 = {
        r.doc_id
        for r in temperature_sample(df, "lang", "doc_id", 1.0, 0.5).collect()
    }
    assert got1 == ref1 and thr1["a"] == thr1["b"] == BUCKETS // 2
    # alpha=0: equal EXPECTED counts per group -> thresholds inversely
    # proportional to group size
    ref0, thr0 = _temp_reference(rows, 0.0, 0.5)
    got0 = {
        r.doc_id
        for r in temperature_sample(df, "lang", "doc_id", 0.0, 0.5).collect()
    }
    # b clamps to keep-all (0.5 * 400/100 * 1/2 = 1.0); a gets 1/3
    assert got0 == ref0 and thr0["b"] == BUCKETS and thr0["a"] == 333333
    # nesting in target_frac (thresholds are monotone in it)
    small = {
        r.doc_id
        for r in temperature_sample(df, "lang", "doc_id", 0.5, 0.2).collect()
    }
    big = {
        r.doc_id
        for r in temperature_sample(df, "lang", "doc_id", 0.5, 0.6).collect()
    }
    assert small <= big
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_sample(df, "lang", "doc_id", 0.5, 1.5)
    with _pytest.raises(ValueError):
        temperature_sample(df, "lang", "doc_id", -0.1, 0.5)


def _unimax_greedy(avail, budget, epochs_cap):
    """The paper's sequential greedy (UniMax Alg. 1), pure python:
    ascending by cap, each group takes min(fair share, cap)."""
    order = sorted(avail, key=lambda g: (epochs_cap * avail[g], g))
    left, nleft, out = float(budget), len(order), {}
    for g in order:
        fair = left / nleft
        out[g] = min(fair, float(epochs_cap * avail[g]))
        left -= out[g]
        nleft -= 1
    return out


def test_unimax_allocation_matches_greedy_and_conserves_budget(spark):
    from lieu_spark.functions.sampling import unimax_allocation

    avail = {"a": 100, "b": 350, "c": 4000, "d": 9000, "e": 120}
    # one row per group carrying the full weight, plus a split row to
    # prove the agg sums weights (not counts)
    data = [("a", 60), ("a", 40), ("b", 350), ("c", 4000),
            ("d", 9000), ("e", 120)]
    df = spark.createDataFrame(data, "grp string, w long")
    got = {
        r["grp"]: r
        for r in unimax_allocation(df, "grp", "w", budget=5000,
                                   epochs_cap=2).collect()
    }
    want = _unimax_greedy(avail, 5000, 2)
    assert set(got) == set(avail)
    for g, r in got.items():
        assert r["n_tokens"] == avail[g]
        assert r["alloc_tokens"] == round(want[g])
        assert r["epochs6"] == round(want[g] / avail[g] * 1e6)
        # repetition never exceeds the cap
        assert r["epochs6"] <= 2_000_000
    # small groups cap at exactly 2 epochs, big ones split the rest
    assert got["a"]["epochs6"] == 2_000_000
    assert got["e"]["epochs6"] == 2_000_000
    assert got["c"]["epochs6"] < 1_000_000
    # full budget spent (not everything capped)
    assert sum(r["alloc_tokens"] for r in got.values()) == 5000


def test_unimax_allocation_degenerate_branches(spark):
    from lieu_spark.functions.sampling import unimax_allocation

    # budget above total capacity: every group capped, budget unspent
    df = spark.createDataFrame([("a", 10), ("b", 20)], "grp string, w long")
    got = {r["grp"]: r for r in
           unimax_allocation(df, "grp", "w", budget=10_000,
                             epochs_cap=3).collect()}
    assert got["a"]["alloc_tokens"] == 30 and got["b"]["alloc_tokens"] == 60
    # budget far below any cap: nobody capped, equal split
    got = {r["grp"]: r for r in
           unimax_allocation(df, "grp", "w", budget=10,
                             epochs_cap=3).collect()}
    assert got["a"]["alloc_tokens"] == 5 and got["b"]["alloc_tokens"] == 5
    with pytest.raises(ValueError):
        unimax_allocation(df, "grp", "w", budget=0)
    with pytest.raises(ValueError):
        unimax_allocation(df, "grp", "w", budget=10, epochs_cap=0)


def test_unimax_expand_copies_and_guard(spark):
    from lieu_spark.functions.sampling import unimax_allocation, unimax_expand

    # group a: capped at 2 epochs exactly (integer copies, frac = 0);
    # group b: fractional epochs < 1 (exercises the sequence(1,0) guard
    # — docs whose bucket misses the threshold must emit ZERO rows,
    # never a descending [1,0] sequence)
    data = [(i, "a", 10) for i in range(5)] + [
        (100 + i, "b", 10) for i in range(50)
    ]
    df = spark.createDataFrame(data, "doc_id long, grp string, w long")
    alloc = unimax_allocation(df, "grp", "w", budget=300, epochs_cap=2)
    got = unimax_expand(df, alloc, "grp", "doc_id", salt="t").collect()
    a_rows = [r for r in got if r["grp"] == "a"]
    b_rows = [r for r in got if r["grp"] == "b"]
    # a: cap = 100 <= fair 150 -> capped, exactly 2 copies of all 5 docs
    assert len(a_rows) == 10
    assert sorted(r["epoch"] for r in a_rows if r["doc_id"] == 0) == [1, 2]
    # b: 200 remaining over 500 tokens -> 0.4 epochs; every kept doc
    # appears exactly once, a strict subset of the 50
    assert all(r["epoch"] == 1 for r in b_rows)
    assert 0 < len(b_rows) < 50
    # determinism incl. under repartition
    again = unimax_expand(
        df.repartition(7), alloc, "grp", "doc_id", salt="t"
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_unimax_expand_null_group_materializes(spark):
    from lieu_spark.functions.sampling import unimax_allocation, unimax_expand

    # unimax_allocation counts a NULL group (missing metadata) and
    # assigns it budget; the expansion's null-safe broadcast join must
    # materialize that allocation instead of silently dropping it (and
    # with it the budget the other groups were shrunk to fund)
    data = [(i, None, 10) for i in range(5)] + [(100 + i, "b", 10) for i in range(5)]
    df = spark.createDataFrame(data, "doc_id long, grp string, w long")
    alloc = unimax_allocation(df, "grp", "w", budget=200, epochs_cap=4)
    # both groups get 100 tokens over 50 available -> 2 epochs each
    got = unimax_expand(df, alloc, "grp", "doc_id", salt="t").collect()
    null_rows = [r for r in got if r["grp"] is None]
    b_rows = [r for r in got if r["grp"] == "b"]
    assert len(null_rows) == 10, "NULL group's allocation must expand"
    assert len(b_rows) == 10
    assert sorted(r["epoch"] for r in null_rows if r["doc_id"] == 0) == [1, 2]


def test_soft_dedup_weights_semantics(spark):
    from pyspark.sql import functions as F

    from lieu_spark.functions.sampling import soft_dedup_weights

    # clusters: size 1 (id 0), size 2 (1,2), size 5 (10..14), and
    # size 3 (20..22) — 3 does NOT divide 1e6, so exact mass needs the
    # remainder ppm on the lowest-id member
    rows = (
        [(0, "a"), (1, "b"), (2, "b")]
        + [(10 + i, "c") for i in range(5)]
        + [(20 + i, "d") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, ck string")
    out = {r.doc_id: r for r in soft_dedup_weights(df, "ck", "doc_id").collect()}
    assert out[0].csize == 1 and out[0].weight_ppm == 1_000_000 and out[0].kept == 1
    assert out[1].csize == 2 and out[1].weight_ppm == 500_000
    assert all(out[10 + i].weight_ppm == 200_000 for i in range(5))
    # 1e6 = 3*333333 + 1: the lowest id carries the extra ppm
    assert out[20].weight_ppm == 333_334
    assert out[21].weight_ppm == 333_333 and out[22].weight_ppm == 333_333
    # keep decision is the portable md5 bucket threshold, bit-exact
    import hashlib

    for did, r in out.items():
        bucket = int(hashlib.md5(f"soft{did}".encode()).hexdigest()[:15], 16) % 1_000_000
        assert r.kept == int(bucket < r.weight_ppm), did
    # expected surviving mass per cluster is 1 doc: sum of weights == 1e6
    mass = (
        soft_dedup_weights(df, "ck", "doc_id")
        .groupBy("ck").agg(F.sum("weight_ppm").alias("m")).collect()
    )
    assert all(m.m == 1_000_000 for m in mass)


def test_unimax_allocation_zero_weight_group(spark):
    # a group whose every weight is 0 (or NULL) gets cap 0 -> capped at
    # alloc 0 with epochs6 = 0; the unguarded ratio was 0.0/0 = NaN
    # whose long cast throws under ANSI
    from lieu_spark.functions.sampling import unimax_allocation

    df = spark.createDataFrame(
        [("a", 100)] * 5 + [("z", 0)] * 3 + [("n", None)] * 2,
        "grp string, w long",
    )
    rows = {r.grp: r for r in unimax_allocation(df, "grp", "w", budget=600).collect()}
    assert rows["z"].n_tokens == 0
    assert rows["z"].alloc_tokens == 0
    assert rows["z"].epochs6 == 0
    assert rows["n"].n_tokens == 0 and rows["n"].epochs6 == 0
    # the real group still absorbs the budget up to its cap
    assert rows["a"].alloc_tokens == 600  # capped? cap = 2*500 = 1000 > 600
