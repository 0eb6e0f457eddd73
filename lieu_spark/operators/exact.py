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
