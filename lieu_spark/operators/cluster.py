"""Connected components over the verified-pair edge set.

The reference never transitively closes its same_as graph — canonical
assignment is per-pair (scripts/jobs/dedupe_geojson.py:156-170), which can
leave A~B, B~C with A and C in different "clusters". Clustering via
connected components is the strict generalization (SURVEY.md §3.4):
cluster_id = min(conv_id) over the component.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame groupBy/join rounds. Converges in O(log n) rounds even on
path-shaped components; each round is localCheckpoint()ed to truncate
lineage (SURVEY.md §7.3 hard part b).

large-star: for each node u, connect every neighbor v > u to
            m = min(N(u) ∪ {u}).
small-star: for each node u, connect every neighbor v <= u (and u) to
            m = min of that set, dropping self-loops.
Fixpoint: edge multiset stable (checked via count + sum-of-pair-hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    # Bounded formulation (VERDICT r4 #2): per-node minimum via a
    # constant-buffer min() aggregate joined back onto the symmetric
    # edge list — never a collect_set that materializes O(|component|)
    # neighbor arrays inside one aggregation buffer (a 50M-member
    # boilerplate star OOMed an executor under the old shape; a min()
    # buffer is one value and map-side combines). The join re-keys on u
    # — the same hashpartitioning as the aggregate, so Catalyst reuses
    # the exchange; a skewed hub group streams through the sort-merge
    # join (disk-spillable) and AQE skew-split applies.
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("minv"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("minv"), F.col("u")).alias("v"),
        )
    )
    # No trailing distinct: _small_star is the only consumer, its min()
    # aggregate is duplicate-insensitive and its own final distinct
    # dedupes the join output, so the per-iteration edge SET is
    # unchanged while this step sheds a full exchange. Row count stays
    # bounded at |E| (one direction of sym survives v > u per edge).
    return out.filter(F.col("u") != F.col("v"))


def _small_star(edges: DataFrame) -> DataFrame:
    # orient edges high -> low, group by the high endpoint; same
    # bounded agg+join shape as _large_star (no neighbor arrays)
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    from_nbrs = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # the group anchor u itself links to m (u > v >= m, so u != m)
    from_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return from_nbrs.union(from_self).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count("*").alias("c"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["c"], row["h"]


def connected_components(
    pairs: DataFrame, max_iter: int = 50, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """pairs(id_a, id_b) -> (conv_id, cluster_id) for every node that
    appears in an edge; cluster_id = component minimum."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = _signature(edges)
    converged = False
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        sig = _signature(edges)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # a non-converged star graph can still carry a node with edges
        # to TWO candidate roots; the dropDuplicates below would then
        # pick an arbitrary cluster_id — silently nondeterministic
        # assignments that break refresh parity and split leakage
        # guarantees. Fail loud instead; star contraction converges in
        # O(log n) rounds, so max_iter=50 covers any real graph — hitting
        # this means pathological input (or a signature collision) that
        # a human must look at.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations; raise max_iter or inspect the edge set"
        )
    # converged star graph: every edge is (member -> root)
    members = edges.select(F.col("u").alias("conv_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("conv_id")).distinct().withColumn(
        "cluster_id", F.col("conv_id")
    )
    return members.unionByName(roots).dropDuplicates(["conv_id"])


def clusters_with_singletons(all_ids: DataFrame, components: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Every conv gets a cluster; non-duplicated convs are their own
    cluster (unique() parity, lib/lieu/spark/dedupe.py:109-115)."""
    return (
        all_ids.select(F.col(id_col).alias("conv_id"))
        .join(components, "conv_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("conv_id")))
    )


def canonical_flags(components: DataFrame) -> DataFrame:
    """is_canonical = conv is its component's representative — parity with
    lieu's canonical flag (scripts/jobs/dedupe_geojson.py:163-166)."""
    return components.withColumn(
        "is_canonical", F.col("conv_id") == F.col("cluster_id")
    )
