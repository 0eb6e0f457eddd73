"""Exact byte-duplicate path: hash-groupBy star pairing.

Guarantees byte-identical conversations are always paired regardless of
LSH band luck, and is the only dedupe path that applies to content-empty
conversations (no tokens). Parity: the reference's EXACT_DUPLICATE
expansion-equality tier (/root/reference/README.md:240).

Scale shape: groups of identical docs can be enormous at 100 TB
(boilerplate). Emitting all O(g^2) within-group pairs would blow up, so
we emit only the star (rep = min id, edges rep->member) — linear in group
size; connected components closes the clique transitively. This is the
same insight as the reference's pass-1 "compare members to block-min
member" trick (lib/lieu/spark/dedupe.py:63-74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_star_pairs(features: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """(id, text_sha) -> (id_a=rep, id_b=member) pairs, rep = min(id) of
    each text_sha group with >1 member."""
    w = Window.partitionBy("text_sha")
    starred = features.select(id_col, "text_sha").withColumn(
        "rep", F.min(id_col).over(w)
    )
    return (
        starred.filter(F.col(id_col) != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )


def exact_star_pairs_grouped(
    features: DataFrame, group_col: str, id_col: str = "conv_id"
) -> DataFrame:
    """Star per (text_sha, ``group_col``) SUBGROUP, plus one hub-to-hub
    edge per subgroup pair within a sha (hub = subgroup min id, null
    group values form their own subgroup).

    Used when auxiliary-field pair rules are active (cfg.asymmetry_field
    / revision_field): the plain star's closure argument — "identical
    text implies identical verdicts, so rep edges + transitivity
    recover every member pair" — breaks once verdicts also depend on a
    per-conversation field signature. Within a subgroup both text AND
    signature are identical, so the guard/revision act uniformly and
    the subgroup closure stays valid; the hub-hub edges carry the
    cross-subgroup verdicts (a presence-asymmetric subgroup pair is
    visibly refused; compatible subgroups still connect).

    Scale: edges stay linear in group size; the hub self-join is
    quadratic only in the number of DISTINCT signatures per sha
    (bounded by the application's tool vocabulary, not corpus size)."""
    w = Window.partitionBy("text_sha", group_col)
    starred = features.select(id_col, "text_sha", group_col).withColumn(
        "rep", F.min(id_col).over(w)
    )
    member_edges = starred.filter(F.col(id_col) != F.col("rep")).select(
        F.col("rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    hubs = starred.select("text_sha", F.col("rep")).distinct()
    hub_edges = (
        hubs.alias("ha")
        .join(hubs.alias("hb"), "text_sha")
        .filter(F.col("ha.rep") < F.col("hb.rep"))
        .select(F.col("ha.rep").alias("id_a"), F.col("hb.rep").alias("id_b"))
    )
    return member_edges.unionByName(hub_edges)
