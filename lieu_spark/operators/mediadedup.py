"""Media near-dup via fingerprint-set Jaccard (video & audio share it).

The classic frame/segment-fingerprint technique: a clip is represented
by the SET of its per-frame (video) or per-window (audio) fingerprints;
two clips are near-dups when the Jaccard similarity of those sets
clears a threshold. Candidate generation is an equi-join on the
fingerprint value — only clips sharing at least one fingerprint ever
pair up, the media analog of the LSH band self-join
(operators/lsh.py): no all-pairs join exists in the plan.

Scale shape: the join shuffles on the fingerprint key, so a HOT
fingerprint (an intro card shared by a million clips, digital silence)
would go quadratic in its bucket exactly like a hot band. The
``max_fp_df`` stop-fingerprint cap is the guard — fingerprints whose
document frequency exceeds the cap are excluded from candidate
generation (the stop-shingle move from operators/spans.py), with set
sizes still computed over the FULL sets so reported Jaccards stay
unbiased for the surviving pairs; recall for pairs whose ONLY overlap
was stop-fingerprints is explicitly traded away, as at corpus scale it
must be.

Reference analog: none in lieu (text-only); same blocking shape as its
near_dupe_hashes pipeline (/root/reference/lib/lieu/dedupe.py:250-325).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fingerprint_jaccard_pairs(
    fps: DataFrame,
    min_jaccard6: int = 300000,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    max_fp_df: int | None = None,
) -> DataFrame:
    """(id, fingerprint) rows -> (id_a, id_b, shared_fp, fp_xor,
    jaccard6).

    jaccard6 = round(1e6 * |A ∩ B| / |A ∪ B|) over the DISTINCT
    fingerprint sets, integer-exact cross-engine. With ``max_fp_df``
    set, fingerprints appearing in more than that many ids are dropped
    from the join side only (the window count reuses the self-join's
    hash exchange — same move as the winnow stop-filter)."""
    base = fps.select(
        F.col(id_col).cast("long").alias("id"), F.col(fp_col).alias("fp")
    ).distinct()
    sizes = base.groupBy("id").agg(F.count("*").alias("nfp"))
    joinable = base
    if max_fp_df is not None:
        joinable = (
            base.withColumn("fp_df", F.count("*").over(Window.partitionBy("fp")))
            .filter(F.col("fp_df") <= max_fp_df)
            .drop("fp_df")
        )
    a = joinable.select(F.col("id").alias("id_a"), "fp")
    b = joinable.select(F.col("id").alias("id_b"), "fp")
    # fp_xor makes the fingerprint VALUES part of the verified output
    # (an oracle that re-derives fingerprints independently must match
    # the xor-fold of the shared ones, not just the equality classes)
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("shared_fp"),
            F.expr("bit_xor(fp)").alias("fp_xor"),
        )
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("nfp").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("nfp").alias("nb"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard6",
            F.round(
                F.lit(1e6)
                * F.col("shared_fp")
                / (F.col("na") + F.col("nb") - F.col("shared_fp"))
            ).cast("long"),
        )
        .filter(F.col("jaccard6") >= min_jaccard6)
        .select("id_a", "id_b", "shared_fp", "fp_xor", "jaccard6")
    )
