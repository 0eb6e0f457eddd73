"""SemDeDup cluster-then-prune (operators/semdedup.py).

Covers: planted exact copies are dropped with the original kept (the
prototypicality rank + id tie-break), rank-1 survival, determinism,
the cell_cap salted guard, and the plan shape (no cartesian product —
the pairwise pass is keyed on cell)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lieu_spark.operators.semdedup import (
    semantic_cells,
    semantic_dedup,
    semantic_dedup_flags,
)


def _emb_df(spark, n=40, dim=8, seed=7, copies=(0, 1, 2)):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    rows += [(i + 1000, [float(x) for x in vecs[i]]) for i in copies]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_copies_dropped_originals_kept(spark):
    e = _emb_df(spark)
    out = semantic_dedup(e, tau=0.95, ncentroids=4).collect()
    by_id = {r.id: r for r in out}
    for orig in (0, 1, 2):
        copy = orig + 1000
        assert by_id[orig].cell == by_id[copy].cell, "exact copy must share the cell"
        assert by_id[orig].keep == 1, "lower id of an identical pair survives"
        assert by_id[copy].keep == 0, "higher id of an identical pair is dropped"
    # random gaussians at dim 8 rarely hit cos >= 0.95; every non-planted
    # row that does get dropped must have a genuine earlier near-dup, so
    # at minimum the three originals plus most of the corpus survive
    assert sum(r.keep for r in out) >= len(out) - 3 - 5


def test_rank_one_always_survives(spark):
    e = _emb_df(spark)
    flags = semantic_dedup(e, tau=0.95, ncentroids=4)
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy(F.col("cent_cos6").desc(), F.col("id").asc())
    ranked = flags.withColumn("rnk", F.row_number().over(w))
    assert ranked.filter((F.col("rnk") == 1) & (F.col("keep") == 0)).count() == 0


def test_deterministic_across_runs(spark):
    e = _emb_df(spark)
    a = sorted(map(tuple, semantic_dedup(e, tau=0.95, ncentroids=4).collect()))
    b = sorted(map(tuple, semantic_dedup(e, tau=0.95, ncentroids=4).collect()))
    assert a == b


def test_cell_cap_guard_still_drops_in_sub(spark):
    # one centroid -> everything in one cell; cap forces salted sub-split.
    # identical vectors hash to the same sub (salt is a function of id?
    # no — of the group key + id bucket), so assert only the mechanism:
    # output ids are preserved and keeps are a subset of the uncapped run
    e = _emb_df(spark, n=20)
    capped = semantic_dedup(e, tau=0.95, ncentroids=1, cell_cap=5)
    rows = capped.collect()
    assert len(rows) == 23
    assert {r.id for r in rows} == {r.vec_id for r in e.collect()}
    # a dropped row under capping must also be droppable without the cap
    # (splitting can only LOSE cross-sub pairs, never invent them)
    uncapped = {r.id: r.keep for r in semantic_dedup(e, tau=0.95, ncentroids=1).collect()}
    for r in rows:
        if r.keep == 0:
            assert uncapped[r.id] == 0


def test_no_cartesian_in_plan(spark):
    e = _emb_df(spark)
    cents = np.eye(4, 8)
    asg = semantic_cells(e, cents)
    plan = semantic_dedup_flags(e, asg, tau=0.95)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("tau,expect_drop", [(1.0, True), (0.999999, True)])
def test_tau_boundary_exact_copy(spark, tau, expect_drop):
    # an exact copy has cos6 == 1e6 exactly; it must be dropped even at
    # tau = 1.0 (>= comparison on the quantized value)
    e = _emb_df(spark, n=6, copies=(0,))
    out = {r.id: r.keep for r in semantic_dedup(e, tau=tau, ncentroids=2).collect()}
    assert (out[1000] == 0) is expect_drop


def test_cell_cap_defaults_on(spark):
    """The salted guard is the DEFAULT (not opt-in): a composed path
    that forgets to pass cell_cap must still be bounded when k-means
    collapses the corpus into one cell."""
    import inspect

    from lieu_spark.operators.semdedup import DEFAULT_CELL_CAP

    for fn in (semantic_dedup, semantic_dedup_flags):
        assert (
            inspect.signature(fn).parameters["cell_cap"].default
            == DEFAULT_CELL_CAP
        )
    assert DEFAULT_CELL_CAP is not None and DEFAULT_CELL_CAP > 0


def test_one_hot_cell_skew_stays_bounded(spark):
    """Pathological skew (mirror of test_skew.py for bands): 600
    near-identical vectors collapse into ONE cell. The salted sub-split
    must bound the within-cell pair join at ~cap^2/2 per sub instead of
    n^2/2 for the cell, while still dropping near-dups inside each sub."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(8)
    rows = [
        (i, [float(x) for x in (base + 1e-4 * rng.standard_normal(8))])
        for i in range(600)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    from lieu_spark.operators.ann import ivf_centroids
    from lieu_spark.operators.lsh import salted_groups

    cents = ivf_centroids(e, ncentroids=1)
    asg = semantic_cells(e, cents)
    cap = 50
    sizes = [
        r["n"]
        for r in salted_groups(asg, ["cell"], cap)
        .groupBy("cell", "sub")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    # ceil(600/50) = 12 hash-salted subs, ~50 each; the hash split is
    # approximate, so allow 3x the target — what matters is that no sub
    # approaches the unsalted 600
    assert len(sizes) >= 8
    assert max(sizes) <= 3 * cap
    # pair-join work: sum over subs of C(size, 2) must be far below the
    # unsalted C(600, 2) = 179,700
    pair_work = sum(s * (s - 1) // 2 for s in sizes)
    assert pair_work < 0.2 * (600 * 599 // 2), pair_work

    out = semantic_dedup(e, tau=0.95, ncentroids=1, cell_cap=cap).collect()
    assert len(out) == 600
    # within each sub, rank-1 survives and every later near-identical
    # member is dropped -> survivors ~ number of subs
    keeps = sum(r.keep for r in out)
    assert keeps == len(sizes), (keeps, len(sizes))


def test_null_embedding_rows_do_not_crash(spark):
    # one NULL embedding used to kill the assignment UDF (np.stack on a
    # 0-d array) — it must simply carry no assignment row, leaving the
    # rest of the sweep intact
    from lieu_spark.operators.ann import ivf_centroids

    base = _emb_df(spark)
    with_null = base.unionByName(
        spark.createDataFrame([(9999, None)], "vec_id long, embedding array<float>")
    )
    cents = ivf_centroids(base, ncentroids=4, id_col="vec_id", vec_col="embedding")
    cells = semantic_cells(with_null, cents)
    ids = {r.id for r in cells.collect()}
    assert 9999 not in ids
    assert len(ids) == base.count()
    flags = semantic_dedup_flags(with_null, cells)
    # planted copies still pruned, originals kept
    kept = {r.id for r in flags.filter(F.col("keep") == 1).collect()}
    assert 0 in kept and 1000 not in kept
