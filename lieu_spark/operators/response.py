"""Per-record dedupe response assembly — lieu's output record shape.

Reference parity: ``DedupeResponse`` (/root/reference/lib/lieu/api.py:48-144,
assembled in scripts/jobs/dedupe_geojson.py:179-198): for every input
record, ``{object, is_dupe, same_as: [...], possibly_same_as: [...]}``
where same_as entries carry (classification, is_canonical, similarity,
explain) and possibly_same_as is ordered by similarity DESCENDING
(W3, lib/lieu/api.py:142-143).

Ours is the DataFrame equivalent: one row per conversation with nested
arrays, built from the verified-pairs and clusters tables. ``explain``
is the list of candidate sources/methods that produced the pair — the
analog of lieu's explain dict (api.py:84-109).

Scale shape: pairs are symmetrized (each verdict serves both endpoints),
then one groupBy(conv_id) with sort_array(collect_list(struct(...)))
builds the ordered neighbor lists — a single keyed shuffle; the
canonical flag is a join against the clusters table on conv_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .verify import STATUS_EXACT, STATUS_LIKELY, STATUS_REVIEW


def _symmetrize(verified: DataFrame) -> DataFrame:
    cols = [
        F.col("jaccard"),
        F.col("status"),
        F.col("method"),
    ]
    fwd = verified.select(
        F.col("id_a").alias("conv_id"), F.col("id_b").alias("other_id"), *cols
    )
    rev = verified.select(
        F.col("id_b").alias("conv_id"), F.col("id_a").alias("other_id"), *cols
    )
    return fwd.unionByName(rev)


def dedupe_responses(
    conversations: DataFrame, verified: DataFrame, clusters: DataFrame
) -> DataFrame:
    """(conv_id, is_dupe, is_canonical, cluster_id,
    same_as:   array<struct<other_id, classification, similarity, is_canonical>>,
    possibly_same_as: same struct> — neighbor lists ordered by
    similarity desc with other_id asc tie-break (deterministic W3)."""
    sym = _symmetrize(verified)
    canon = clusters.select(
        F.col("conv_id").alias("other_id"),
        (F.col("conv_id") == F.col("cluster_id")).alias("other_is_canonical"),
    )
    # default True for neighbors absent from the clusters table — the
    # SAME default the record-level is_canonical coalesce applies below
    # for the same unclustered doc (an unclustered doc is its own
    # canonical); False here made the nested flag contradict the
    # neighbor's own top-level row for every REVIEW-only pair
    sym = sym.join(canon, "other_id", "left").withColumn(
        "other_is_canonical", F.coalesce(F.col("other_is_canonical"), F.lit(True))
    )
    entry = F.struct(
        # sim desc, id asc: negate sim for ascending array_sort
        (-F.round(F.col("jaccard") * 1e6).cast("long")).alias("_neg_sim6"),
        F.col("other_id"),
        F.col("status").alias("classification"),
        F.col("jaccard").alias("similarity"),
        F.col("other_is_canonical").alias("is_canonical"),
        F.col("method"),
    )
    dupe_statuses = [STATUS_EXACT, STATUS_LIKELY]
    grouped = sym.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("status").isin(dupe_statuses), entry)
                )
            ),
            lambda s: s.dropFields("_neg_sim6"),
        ).alias("same_as"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("status") == STATUS_REVIEW, entry)
                )
            ),
            lambda s: s.dropFields("_neg_sim6"),
        ).alias("possibly_same_as"),
    )
    base = conversations.select("conv_id").join(grouped, "conv_id", "left")
    base = base.withColumn(
        "same_as", F.coalesce(F.col("same_as"), F.array())
    ).withColumn(
        "possibly_same_as", F.coalesce(F.col("possibly_same_as"), F.array())
    )
    cl = clusters.select(
        "conv_id",
        "cluster_id",
        (F.col("conv_id") == F.col("cluster_id")).alias("is_canonical"),
    )
    return (
        base.join(cl, "conv_id", "left")
        .withColumn(
            "is_canonical", F.coalesce(F.col("is_canonical"), F.lit(True))
        )
        # Reference parity (dedupe_geojson.py:179-198 keys `dupes` on uid1
        # only): the cluster canonical is is_dupe=False even though its
        # symmetrized same_as list is non-empty, so the reference's
        # "keep non-dupes" recipe keeps exactly one record per cluster.
        .withColumn(
            "is_dupe", (F.size("same_as") > 0) & ~F.col("is_canonical")
        )
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("conv_id"))
        )
        .select(
            "conv_id",
            "is_dupe",
            "is_canonical",
            "cluster_id",
            "same_as",
            "possibly_same_as",
        )
    )
