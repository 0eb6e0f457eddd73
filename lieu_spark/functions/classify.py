"""Model-based quality classification — the fastText-filter stage of a
web-scale curation pipeline (CCNet's fastText LM filter, FineWeb-Edu's
quality classifier, RefinedWeb's line-quality models), rebuilt as a
distributed multinomial Naive Bayes over hashed unigram buckets.

The standard bootstrap: a cheap deterministic heuristic seeds labels on
a SLICE of the corpus (1 = positive, 0 = negative, NULL = unlabeled),
the classifier fits class-conditional bucket models + class priors on
the seeded slice only, and then scores EVERY document — including the
unlabeled middle the heuristic could not call. This is a different
capability from the two neighbouring scorers: `analysis.bigram_lm_scores`
is an unsupervised perplexity proxy (no labels, no decision), and
`weighting.dsir_logweights` ranks by target-likeness for selection (no
priors, no verdict); here the output is a calibrated two-class decision.

Exact integer scoring (house pattern, proven in dsir_logweights):

    delta6(b) = round((ln((np_b+1)/(Np+m)) - ln((nn_b+1)/(Nn+m))) * 1e6)
    prior6    = round(ln((Dp+1)/(Dn+1)) * 1e6)
    score6    = prior6 + sum over the doc's tokens of delta6(bucket)
    pred      = 1 iff score6 > 0

per-bucket quantization happens BEFORE the per-doc sum, so the doc
score is exact integer arithmetic and a DuckDB oracle re-derives every
verdict bit-for-bit. Bucket hashing is the md5-prefix recipe
(salt-domain-separated), portable to SQL.

Scale shape (mirrors dsir_logweights, measured there): ONE map-side
combinable hash agg reduces the token stream to persisted
per-(doc, bucket) counts; the class model (m-bounded -> broadcast),
the priors (lazy broadcast 1-row agg — no action at plan time), and
the doc scores all derive from that cache, so the corpus is tokenized
exactly once. Linear, skew-free (buckets near-uniform), no window, no
global sort, zero UDFs. No lieu analog — beyond-reference training-data
operator in the spirit of SURVEY.md §7's quality gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NB_BUCKETS = 4096
_NB_SALT = "nbq:"


def nb_quality_scores(
    docs: DataFrame,
    seed_label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = NB_BUCKETS,
) -> DataFrame:
    """(id, seed_label, n_feats, score6, pred) for EVERY input doc.

    ``seed_label`` is an int Column: 1 = positive seed, 0 = negative
    seed, NULL = unlabeled (scored but never trained on). Buckets seen
    only in unlabeled docs still get a delta6 row (np = nn = 0 —
    Laplace mass only), so unlabeled-only vocabulary scores exactly
    like the SQL twin. Zero-token docs surface with n_feats = 0 and
    score6 = prior6 (the prior decides). ``pred`` is int, not boolean
    (driver value-hash parity with DuckDB).
    """
    from .text import tokenize

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    toks = docs.select(
        F.col(id_col).alias(id_col),
        seed_label.cast("int").alias("__lbl"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    feats = toks.select(
        id_col,
        "__lbl",
        F.explode(F.col("toks")).alias("tk"),
    ).withColumn(
        "__bkt",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(_NB_SALT), F.col("tk"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ),
    )
    # tokenize + explode exactly once: the class model and the doc
    # scores are DIFFERENTLY-PRUNED consumers of the same subtree, so
    # exchange reuse will not unify them (measured on the bigram-LM
    # chain) — materialize the reduced per-(doc, bucket) counts.
    # localCheckpoint (lazy), not persist: CacheManager holds persist
    # entries until an explicit unpersist this local handle can never
    # issue (the analysis.py/weighting.py leak-class fix).
    dbc = (
        feats.groupBy(id_col, "__lbl", "__bkt")
        .agg(F.count("*").alias("__c"))
        .localCheckpoint(eager=False)
    )
    cls = dbc.groupBy("__bkt").agg(
        F.sum(F.when(F.col("__lbl") == 1, F.col("__c")).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("__lbl") == 0, F.col("__c")).otherwise(0)).alias("nn"),
    )
    # token totals AND doc-count priors in one lazy broadcast 1-row agg
    tot = dbc.agg(
        F.coalesce(
            F.sum(F.when(F.col("__lbl") == 1, F.col("__c"))), F.lit(0)
        ).cast("double").alias("_np_tot"),
        F.coalesce(
            F.sum(F.when(F.col("__lbl") == 0, F.col("__c"))), F.lit(0)
        ).cast("double").alias("_nn_tot"),
    )
    pri = docs.agg(
        F.round(
            F.log(
                (
                    F.coalesce(
                        F.sum(F.when(seed_label.cast("int") == 1, 1)), F.lit(0)
                    ).cast("double")
                    + F.lit(1.0)
                )
                / (
                    F.coalesce(
                        F.sum(F.when(seed_label.cast("int") == 0, 1)), F.lit(0)
                    ).cast("double")
                    + F.lit(1.0)
                )
            )
            * 1e6
        )
        .cast("long")
        .alias("prior6")
    )
    wt = cls.crossJoin(F.broadcast(tot)).select(
        "__bkt",
        F.round(
            (
                F.log((F.col("np") + F.lit(1.0)) / (F.col("_np_tot") + F.lit(float(m))))
                - F.log((F.col("nn") + F.lit(1.0)) / (F.col("_nn_tot") + F.lit(float(m))))
            )
            * 1e6
        )
        .cast("long")
        .alias("delta6"),
    )
    per_doc = (
        dbc.join(F.broadcast(wt), "__bkt")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_feats"),
            F.sum(F.col("__c") * F.col("delta6")).cast("long").alias("__lik6"),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias(id_col), seed_label.cast("int").alias("seed_label")
        )
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(pri))
        .select(
            id_col,
            "seed_label",
            F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
            (F.col("prior6") + F.coalesce(F.col("__lik6"), F.lit(0).cast("long")))
            .cast("long")
            .alias("score6"),
        )
        # per-token mean — fastText's length normalization; the raw NB
        # posterior sum grows with doc length, so corpus-specific
        # thresholds calibrate against mean6, not score6
        .withColumn(
            "mean6",
            F.round(
                F.col("score6").cast("double")
                / F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
            ).cast("long"),
        )
        .withColumn("pred", (F.col("score6") > 0).cast("int"))
    )


# ---------------------------------------------------------------------------
# Nearest-centroid (Rocchio) embedding classifier
# ---------------------------------------------------------------------------
#
# The embedding-side sibling of the token-space NB above — the
# DataComp/FineWeb-Edu pattern of scoring documents by proximity to a
# labeled prototype in embedding space, rebuilt as exact integer math:
# embeddings quantize to micro-units (round(x * 1e6) as long), per-label
# centroids are half-away-from-zero-rounded integer means, and the
# classifier assigns each vector to the label with the smallest integer
# squared Euclidean distance (ties break to the smaller label). Every
# step is reproducible bit-for-bit in SQL, so the DuckDB oracle
# re-derives centroids and every assignment.
#
# Scale shape: fitting is ONE map-side-combinable agg over the
# (label, dim) partials — output is labels x dims rows regardless of
# corpus size; the fitted model collapses to a single broadcast row, so
# classification is a zero-shuffle codegen map over the corpus
# (zip_with + aggregate per candidate label). No per-vector explode, no
# re-shuffle, no UDF.


# round(s / n) in exact integer math, half away from zero (s any sign,
# n > 0) — the `div` magnitude operands are non-negative, so Spark's
# truncating `div` and DuckDB's flooring `//` agree bit-for-bit.
_ROUND_DIV = (
    "CAST(CASE WHEN s >= 0 THEN (2 * s + n) div (2 * n) "
    "ELSE -((-2 * s + n) div (2 * n)) END AS LONG)"
)


def centroid_fit(
    train: DataFrame, vec6_col: str = "v6", label_col: str = "label"
) -> DataFrame:
    """Fit per-label integer centroids over quantized vectors.

    ``train``: (label, v6: array<long>) rows. Returns a ONE-row frame
    ``models: array<struct<label:int, carr:array<long>>>`` sorted by
    label — the broadcastable model."""
    el = train.select(label_col, F.posexplode(F.col(vec6_col)).alias("pos", "x"))
    cen = el.groupBy(label_col, "pos").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    cen = cen.select(label_col, "pos", F.expr(_ROUND_DIV).alias("cent6"))
    per = cen.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cent6"))),
            lambda t: t["cent6"],
        ).alias("carr")
    )
    return per.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(label_col).alias("label"), F.col("carr")))
        ).alias("models")
    )


def centroid_predict(
    test: DataFrame, model: DataFrame, vec6_col: str = "v6"
) -> DataFrame:
    """Assign each test vector to the nearest centroid.

    Adds (pred_label, d2) to ``test``: d2 is the exact integer squared
    Euclidean distance to the winning centroid, ties to the smaller
    label (struct ordering of (d2, label))."""
    t = test.crossJoin(F.broadcast(model))
    scores = F.transform(
        F.col("models"),
        lambda m: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec6_col), m["carr"], lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2"),
            m["label"].alias("label"),
        ),
    )
    best = F.array_min(scores)
    return t.withColumn("__best", best).select(
        *test.columns,
        F.col("__best.label").alias("pred_label"),
        F.col("__best.d2").alias("d2"),
    )
