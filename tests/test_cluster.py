"""Connected components: path/star/merge topologies vs union-find oracle,
and partition-count independence."""

import pytest

from lieu_spark import oracle
from lieu_spark.operators.cluster import (
    canonical_flags,
    clusters_with_singletons,
    connected_components,
)


def _run(spark, edges):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    return {r.conv_id: r.cluster_id for r in connected_components(df).collect()}


def _oracle(edges):
    return oracle.cluster_pairs(edges)


def test_path_graph(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
    got = _run(spark, edges)
    assert set(got.values()) == {"n0"}
    assert got == _oracle(edges)


def test_star_graph(spark):
    edges = [("hub", f"leaf{i}") for i in range(8)]
    got = _run(spark, edges)
    assert all(v == "hub" for v in got.values())


def test_two_components_merge(spark):
    edges = [("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("a3", "b1")]
    got = _run(spark, edges)
    assert set(got.values()) == {"a1"}
    edges2 = [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    got2 = _run(spark, edges2)
    assert got2 == _oracle(edges2)


def test_partition_count_independence(spark):
    edges = [(f"x{i}", f"x{(i * 7) % 20}") for i in range(20) if i != (i * 7) % 20]
    df1 = spark.createDataFrame(edges, "id_a string, id_b string").repartition(1)
    df8 = spark.createDataFrame(edges, "id_a string, id_b string").repartition(8)
    r1 = {r.conv_id: r.cluster_id for r in connected_components(df1).collect()}
    r8 = {r.conv_id: r.cluster_id for r in connected_components(df8).collect()}
    assert r1 == r8 == _oracle(edges)


def test_singletons_and_canonical(spark):
    edges = [("a", "b")]
    comp = connected_components(spark.createDataFrame(edges, "id_a string, id_b string"))
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], ["conv_id"])
    full = {r.conv_id: r.cluster_id for r in clusters_with_singletons(ids, comp).collect()}
    assert full == {"a": "a", "b": "a", "c": "c"}
    flags = {r.conv_id: r.is_canonical for r in canonical_flags(comp).collect()}
    assert flags == {"a": True, "b": False}


def test_connected_components_raises_on_non_convergence(spark):
    # an exhausted iteration budget must fail loud — a non-converged
    # star graph would otherwise hand dropDuplicates a node with two
    # candidate roots and emit an arbitrary cluster_id
    import pytest

    from lieu_spark.operators.cluster import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=0)


@pytest.mark.slow
def test_giant_star_bounded_memory_shape(spark):
    """The star steps must never buffer a neighborhood array: a 200k-
    spoke hub is the planted boilerplate-star shape that OOMs a
    collect_set buffer at 100x scale (VERDICT r4 #2). Beyond completing,
    the physical plan must contain NO collect_set/Generate (array agg +
    explode) — per-node state is a constant-size min() buffer."""
    from pyspark.sql import functions as F

    from lieu_spark.operators.cluster import _large_star, connected_components

    n = 200_000
    pairs = spark.range(1, n + 1).select(
        F.lit("hub").alias("id_a"),
        F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 7, "0")).alias(
            "id_b"
        ),
    )
    plan = _large_star(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "collect_set" not in plan, plan
    assert "Generate" not in plan, plan
    comp = connected_components(pairs)
    agg = comp.agg(
        F.countDistinct("cluster_id").alias("k"), F.count("*").alias("n")
    ).collect()[0]
    assert (agg.k, agg.n) == (1, n + 1)
