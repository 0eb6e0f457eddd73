"""Pairwise verification — the second tier of lieu's two-tier verdict.

Reference parity: blocking keys only generate candidates; classification
happens in pairwise comparison with thresholds likely>=0.9 / review>=0.7
(/root/reference/README.md:23, lib/lieu/api.py:61-64, similarity scoring
lib/lieu/similarity.py:14-79). Our verifier is exact Jaccard over distinct
shingle-hash sets, computed entirely JVM-side:

    j = |A ∩ B| / (|A| + |B| - |A ∩ B|)   via array_intersect + sizes

``verify_mode="signatures"`` swaps in the MinHash-agreement estimator
(zip_with equality fraction) — 1 KB/row instead of full shingle sets, the
knob to flip at 100 TB when shingle arrays dominate shuffle volume.
``verify_mode="soft_tfidf"`` swaps in lieu's token-edit-tolerant
Soft-TFIDF tier (lib/lieu/similarity.py:14-60, functions/softtfidf.py)
for corpora where per-token typos tank set-based Jaccard.

The pair enrichment join is the reference's ``IDPairRDD.join_pairs``
double-join (lib/lieu/spark/utils.py:5-24) re-expressed as two DataFrame
joins against the features table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig

STATUS_EXACT = "exact_duplicate"
STATUS_LIKELY = "likely_duplicate"
STATUS_REVIEW = "needs_review"
STATUS_NON = "non_duplicate"
# P8 refusal verdict (reference NULL_DUPE, lib/lieu/dedupe.py:103-108):
# asymmetric auxiliary evidence — neither duplicate nor non-duplicate.
# Never in dupe_pairs (clustering) nor review_pairs.
STATUS_NULL = "null_dupe"


def join_pair_features(
    pairs: DataFrame, features: DataFrame, cols: list[str], id_col: str = "conv_id"
) -> DataFrame:
    """pairs(id_a, id_b, ...) ⋈ features twice -> suffixed feature cols.

    J2 parity (lib/lieu/spark/utils.py:5-24). Catalyst broadcast-joins the
    features side when small; at scale both joins shuffle on id once each.
    """
    fa = features.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in cols]
    )
    fb = features.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in cols]
    )
    return pairs.join(fa, "id_a").join(fb, "id_b")


def jaccard_on_shingles(col_a, col_b):
    inter = F.size(F.array_intersect(col_a, col_b))
    union = F.size(col_a) + F.size(col_b) - inter
    # J(∅,∅) := 0 — content-empty docs are not "similar", they are only
    # ever duplicates via the exact byte-hash path (operators/exact.py)
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


def signature_agreement(col_a, col_b, num_perm: int):
    # J(∅,∅) := 0 here too: a content-empty doc carries the ALL-SENTINEL
    # signature (every bin MASK64, stored as long -1 — minhash.py), so
    # two empty docs would otherwise agree 128/128 and byte-different
    # empty-content convs would classify likely_duplicate under
    # verify_mode='signatures' while the shingles mode (and the policy
    # in jaccard_on_shingles above) says 0.0 for the identical input;
    # empty docs pair only via the exact byte-hash path
    sentinel = F.lit(-1).cast("long")
    both_empty = F.forall(col_a, lambda x: x == sentinel) & F.forall(
        col_b, lambda x: x == sentinel
    )
    eq = F.size(
        F.filter(F.zip_with(col_a, col_b, lambda x, y: x == y), lambda b: b)
    )
    return F.when(both_empty, F.lit(0.0)).otherwise(
        eq.cast("double") / F.lit(float(num_perm))
    )


def classify(jaccard_col, exact_col, cfg: DedupeConfig):
    """Two-tier status column (lieu api.py:61-64 semantics)."""
    return (
        F.when(exact_col, F.lit(STATUS_EXACT))
        .when(jaccard_col >= cfg.threshold_likely, F.lit(STATUS_LIKELY))
        .when(jaccard_col >= cfg.threshold_review, F.lit(STATUS_REVIEW))
        .otherwise(F.lit(STATUS_NON))
    )


def _stage_families(
    enriched: DataFrame, primary_col: str, alt_col: str
) -> DataFrame:
    """Stage per-side gram-family columns as concrete projections
    (_word_*/_char_*) so the family-selection CASE below references
    plain attributes instead of duplicating the array expressions.
    char_primary decides which stored column is which family; docs
    outside the hysteresis band carry empty/null alt, so exactly one
    family is populated for them."""
    out = enriched
    for side in ("a", "b"):
        cp = F.col(f"char_primary_{side}")
        prim = F.col(f"{primary_col}_{side}")
        alt = F.col(f"{alt_col}_{side}")
        out = out.withColumn(f"_word_{side}", F.when(cp, alt).otherwise(prim))
        out = out.withColumn(f"_char_{side}", F.when(cp, prim).otherwise(alt))
    return out


def verify_pairs(
    pairs: DataFrame, features: DataFrame, cfg: DedupeConfig, method: str = "minhash_lsh"
) -> DataFrame:
    """Candidate pairs -> verified pairs with (jaccard, status, method).

    Keeps every candidate's verdict; downstream filters select
    EXACT/LIKELY for clustering (P5 parity, lib/lieu/spark/dedupe.py:45).
    """
    passthrough = [c for c in pairs.columns if c not in ("id_a", "id_b")]
    if cfg.verify_mode == "soft_tfidf":
        # lieu's token-edit-tolerant tier (similarity.py:14-60): the
        # similarity column holds the Soft-TFIDF score instead of set
        # Jaccard. Corpus-level TF-IDF comes from the feature table's
        # tokens (build_features keeps them in this mode).
        from ..functions.softtfidf import soft_tfidf_for_pairs

        docs_tokens = features.select(F.col("conv_id").alias("doc_id"), "tokens")
        scored = soft_tfidf_for_pairs(
            pairs.select("id_a", "id_b"),
            docs_tokens,
            theta6=cfg.soft_theta6,
            max_tokens=cfg.soft_max_tokens,
        ).select("id_a", "id_b", "soft6")
        # LEFT join + 0-fill: soft scores exist only for pairs where both
        # sides tokenize non-empty AND share >= 1 fuzzy token match; an
        # inner join would silently drop the rest — including exact-sha
        # pairs of token-less docs (punctuation-only text), which every
        # other mode classifies EXACT via the text_sha comparison below.
        # The sha enrichment is the shared J2 double-join.
        enriched = join_pair_features(
            pairs.join(scored, ["id_a", "id_b"], "left").na.fill({"soft6": 0}),
            features,
            ["text_sha"],
        )
        j = F.col("soft6").cast("double") / F.lit(1e6)
    elif cfg.verify_mode == "signatures":
        dual = "alt_sig" in features.columns and "char_primary" in features.columns
        cols = ["sig", "text_sha"] + (["alt_sig", "char_primary"] if dual else [])
        enriched = join_pair_features(pairs, features, cols)
        if dual:
            # family-aligned agreement (hysteresis band): compare the
            # family BOTH sides carry, preferring word; sides outside
            # the band have null alt_sig, so the word/char selection
            # degenerates to the primary sig exactly as before
            enriched = _stage_families(enriched, "sig", "alt_sig")
            word_ok = F.col("_word_a").isNotNull() & F.col("_word_b").isNotNull()
            char_ok = F.col("_char_a").isNotNull() & F.col("_char_b").isNotNull()
            j = (
                F.when(
                    word_ok,
                    signature_agreement(
                        F.col("_word_a"), F.col("_word_b"), cfg.num_perm
                    ),
                )
                .when(
                    char_ok,
                    signature_agreement(
                        F.col("_char_a"), F.col("_char_b"), cfg.num_perm
                    ),
                )
                .otherwise(F.lit(0.0))
            )
        else:
            j = signature_agreement(F.col("sig_a"), F.col("sig_b"), cfg.num_perm)
    else:
        dual = "alt_hashes" in features.columns and "char_primary" in features.columns
        cols = ["shingle_hashes", "text_sha"] + (
            ["alt_hashes", "char_primary"] if dual else []
        )
        enriched = join_pair_features(pairs, features, cols)
        if dual:
            # family-aligned Jaccard: a straddling pair (one side char-
            # primary in the hysteresis band, the other word-primary)
            # compares word-to-word via the band side's alt set instead
            # of intersecting disjoint hash families (guaranteed J=0,
            # the round-2 advisory's recall cliff). Out-of-band docs
            # carry empty alt arrays, so latin/latin and cjk/cjk pairs
            # reduce to the primary sets exactly as before.
            enriched = _stage_families(enriched, "shingle_hashes", "alt_hashes")
            word_ok = (F.size("_word_a") > 0) & (F.size("_word_b") > 0)
            j = F.when(
                word_ok, jaccard_on_shingles(F.col("_word_a"), F.col("_word_b"))
            ).otherwise(jaccard_on_shingles(F.col("_char_a"), F.col("_char_b")))
        else:
            j = jaccard_on_shingles(
                F.col("shingle_hashes_a"), F.col("shingle_hashes_b")
            )
    exact = F.col("text_sha_a") == F.col("text_sha_b")
    out = enriched.withColumn("jaccard", j).withColumn("is_exact", exact)
    out = out.withColumn("status", classify(F.col("jaccard"), F.col("is_exact"), cfg))
    out = out.withColumn("method", F.lit(method))
    return out.select(
        "id_a", "id_b", "jaccard", "is_exact", "status", "method", *passthrough
    )


def dupe_pairs(verified: DataFrame) -> DataFrame:
    """EXACT + LIKELY pairs — the clustering edge set (P5 parity)."""
    return verified.filter(F.col("status").isin(STATUS_EXACT, STATUS_LIKELY))


def review_pairs(verified: DataFrame) -> DataFrame:
    return verified.filter(F.col("status") == STATUS_REVIEW)


def reconcile(minhash_verified: DataFrame, simhash_verified: DataFrame) -> DataFrame:
    """Merge verdicts from the MinHash and SimHash paths on the same pair,
    keeping the stronger verdict — the structural analog of the
    reference's phone-number verdict revision (lib/lieu/dedupe.py:356-372)
    where a second signal upgrades/downgrades the primary verdict.

    Pair key is normalized (id_a < id_b) on both inputs; strength order:
    exact > likely > review > non, ties broken by higher jaccard then
    method name for determinism.
    """
    both = minhash_verified.unionByName(simhash_verified)
    rank = (
        F.when(F.col("status") == STATUS_EXACT, 3)
        .when(F.col("status") == STATUS_LIKELY, 2)
        .when(F.col("status") == STATUS_REVIEW, 1)
        .otherwise(0)
    )
    ranked = both.withColumn("_rank", rank)
    best = F.max(
        F.struct(
            F.col("_rank"), F.col("jaccard"), F.col("method"),
            F.col("status"), F.col("is_exact"),
        )
    ).alias("best")
    out = ranked.groupBy("id_a", "id_b").agg(
        best, F.array_sort(F.collect_set("method")).alias("methods")
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("best.jaccard").alias("jaccard"),
        F.col("best.is_exact").alias("is_exact"),
        F.col("best.status").alias("status"),
        F.col("best.method").alias("method"),
        "methods",
    )
