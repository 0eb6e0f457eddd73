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
    features: DataFrame,
    group_col: str,
    id_col: str = "conv_id",
    class_col: str | None = None,
) -> DataFrame:
    """Star per (text_sha, ``group_col``) SUBGROUP, plus hub edges
    connecting subgroups within a sha (hub = subgroup min id, null
    group values form their own subgroup).

    Used when auxiliary-field pair rules are active (cfg.asymmetry_field
    / revision_field): the plain star's closure argument — "identical
    text implies identical verdicts, so rep edges + transitivity
    recover every member pair" — breaks once verdicts also depend on a
    per-conversation field signature. Within a subgroup both text AND
    signature are identical, so the guard/revision act uniformly and
    the subgroup closure stays valid; hub edges carry the
    cross-subgroup verdicts (a presence-asymmetric subgroup pair is
    visibly refused; compatible subgroups still connect).

    ``class_col`` (the scale path — run_pipeline always passes it):
    partitions subgroups into VERDICT-EQUIVALENCE classes — same-sha
    pairs within a class are guaranteed un-refused EXACT duplicates
    (for the pipeline: the asymmetry field's presence flag — the guard
    keys on presence only, and revision never touches EXACT). Hub
    edges are then a STAR per (sha, class) — linear in subgroup count
    — plus one class-min-to-class-min edge per class pair (≤ C(4,2)
    per sha with two active fields) carrying the visible refusal.
    Clustering-equivalent to the all-pairs hub join (within a class
    every hub edge is a dupe edge, so the star's transitive closure
    recovers them; cross-class edges never cluster), but a 50k-
    distinct-signature boilerplate sha costs O(50k) hub edges instead
    of O(50k^2). class_col=None keeps the all-pairs hub join (callers
    without a class notion; only safe for vocabulary-bounded sigs)."""
    w = Window.partitionBy("text_sha", group_col)
    starred = features.select(
        id_col, "text_sha", group_col, *([class_col] if class_col else [])
    ).withColumn("rep", F.min(id_col).over(w))
    member_edges = starred.filter(F.col(id_col) != F.col("rep")).select(
        F.col("rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    if class_col is None:
        hubs = starred.select("text_sha", F.col("rep")).distinct()
        hub_edges = (
            hubs.alias("ha")
            .join(hubs.alias("hb"), "text_sha")
            .filter(F.col("ha.rep") < F.col("hb.rep"))
            .select(F.col("ha.rep").alias("id_a"), F.col("hb.rep").alias("id_b"))
        )
        return member_edges.unionByName(hub_edges)
    hubs = starred.select("text_sha", class_col, "rep").distinct()
    cw = Window.partitionBy("text_sha", class_col)
    hubs = hubs.withColumn("cmin", F.min("rep").over(cw))
    within_class = hubs.filter(F.col("rep") != F.col("cmin")).select(
        F.col("cmin").alias("id_a"), F.col("rep").alias("id_b")
    )
    class_mins = hubs.select("text_sha", "cmin").distinct()
    cross_class = (
        class_mins.alias("ca")
        .join(class_mins.alias("cb"), "text_sha")
        .filter(F.col("ca.cmin") < F.col("cb.cmin"))
        .select(F.col("ca.cmin").alias("id_a"), F.col("cb.cmin").alias("id_b"))
    )
    return member_edges.unionByName(within_class).unionByName(cross_class)
