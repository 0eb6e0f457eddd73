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
document frequency exceeds the cap are excluded ENTIRELY (the
stop-shingle move from operators/spans.py): both the shared count and
the set sizes are computed over the surviving non-stop universe, so
the reported Jaccard is the exact Jaccard of the reduced sets.
(Counting stop fps in the sizes but not the intersection — the
previous shape — biased every hot-fp-sharing pair DOWN and silently
dropped near-threshold true dups.) Recall for pairs whose ONLY overlap
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
    BEFORE the set sizes are computed, so jaccard6 is the exact Jaccard
    of the stop-filtered sets (sizes computed over full sets while the
    intersection excluded stop fps would bias hot-fp pairs down)."""
    # Set sizes ride WITH the rows (window count per id on the one
    # distinct frame) instead of a separate groupBy + two post-agg
    # joins: naively that shape re-derived the distinct 4x with zero
    # ReusedExchange (differently-pruned consumers never unify — the
    # repo-wide Catalyst lesson), i.e. 4 input scans at corpus scale.
    # Here each self-join side is the SAME projected plan, which DOES
    # get exchange reuse. Null fps can never equi-join, so they are
    # excluded from the sets up front (a null would otherwise inflate
    # nfp and deflate every jaccard the id appears in).
    # ids pass through with their NATIVE type: a cast("long") here threw
    # CAST_INVALID_INPUT under ANSI for string conv-style ids, an
    # undocumented numeric-only precondition — ordering (id_a < id_b),
    # the per-id window, and the equi-join all work on any orderable id
    base = fps.select(
        F.col(id_col).alias("id"), F.col(fp_col).alias("fp")
    ).filter(F.col("fp").isNotNull()).distinct()
    if max_fp_df is not None:
        # stop-filter FIRST so nfp counts the surviving universe; this
        # orders the fp-window before the id-window (one extra exchange
        # vs the uncapped branch — the price of unbiased reduced-set
        # Jaccards)
        base = base.withColumn(
            "fp_df", F.count("*").over(Window.partitionBy("fp"))
        ).filter(F.col("fp_df") <= max_fp_df).drop("fp_df")
    base = base.withColumn("nfp", F.count("*").over(Window.partitionBy("id")))
    a = base.select(F.col("id").alias("id_a"), "fp", F.col("nfp").alias("na"))
    b = base.select(F.col("id").alias("id_b"), "fp", F.col("nfp").alias("nb"))
    # fp_xor makes the fingerprint VALUES part of the verified output
    # (an oracle that re-derives fingerprints independently must match
    # the xor-fold of the shared ones, not just the equality classes);
    # na/nb are constant per id so they join the grouping key for free.
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(
            F.count("*").alias("shared_fp"),
            F.expr("bit_xor(fp)").alias("fp_xor"),
        )
    )
    return (
        shared.withColumn(
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
