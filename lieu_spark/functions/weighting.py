"""Token weighting: TF-IDF and information gain — the reference's word
index (SURVEY.md §2 A8/A9).

Reference parity:
- TF-IDF doc frequencies + scoring: /root/reference/lib/lieu/tfidf.py:13-98
  (score = log(tf + 1) * log(N / df), L2-normalized per doc;
  zero-norm -> uniform 1/sqrt(n))
- information gain: lib/lieu/information_gain.py:12-102 and the
  distributed variant lib/lieu/spark/information_gain.py:16-75
  (ig(w) = sum over contexts c of p(w,c) * log2(p(w,c) / (p(w)*p(c)))
  clamped >= 0; words with no co-occurrences get -log2(p(w)))

The reference computes these with ~6 reduceByKey/join shuffles of
per-row Python; here each is a short chain of groupBy/join/log
expressions that Catalyst executes with partial aggregation. Not used
by the MinHash pipeline (unweighted Jaccard per north_rule) — provided
for capability parity; ``weighted_jaccard_for_pairs`` applies them as
an alternative pair verifier (the analog of the reference's
soft-TFIDF fuzzy scoring, lib/lieu/similarity.py:14-60: shared RARE
tokens count more than shared boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_frequencies(docs_tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, tokens array) -> (token, df) distinct-doc frequencies.
    Reference: lib/lieu/tfidf.py:52-66 (update_doc_frequency)."""
    return (
        docs_tokens.select(id_col, F.explode(F.array_distinct("tokens")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )


def tfidf_scores(
    docs_tokens: DataFrame, id_col: str = "doc_id", min_df: int = 1
) -> DataFrame:
    """Per (doc, token): tf, df, and L2-normalized tf-idf score.

    score = log(tf + 1) * log(N / df)   (lib/lieu/tfidf.py:85-98)
    norm  = score / sqrt(sum score^2 per doc); all-zero doc -> uniform
            1/sqrt(n_distinct_tokens) (lib/lieu/word_index.py:14-36).
    """
    # N as a lazy broadcast scalar, not a driver-side count(): a count
    # here is a Spark action during PLAN CONSTRUCTION — it materializes
    # the full upstream lineage before the real job runs (and in
    # streaming foreachBatch it would fire per micro-batch).
    n = docs_tokens.agg(F.count("*").cast("double").alias("_n_docs"))
    # one explode pass, persisted: tf has exactly one row per distinct
    # (doc, token), so df = count per token over tf IS the distinct-doc
    # frequency — no second explode of the corpus (doc_frequencies
    # stays for standalone callers). scored is persisted too because it
    # feeds both the norm aggregation and the final join, and exchange
    # reuse does not unify differently-pruned subtrees (measured on the
    # bigram-LM chain: 4 corpus scans, 0 ReusedExchange).
    tf = (
        docs_tokens.select(id_col, F.explode("tokens").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df")).filter(
        F.col("df") >= min_df
    )
    scored = tf.join(df, "token").crossJoin(F.broadcast(n)).withColumn(
        "score",
        F.log(F.col("tf") + 1.0) * F.log(F.col("_n_docs") / F.col("df")),
    ).drop("_n_docs").localCheckpoint(eager=False)
    norms = scored.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("score") * F.col("score"))).alias("l2"),
        F.count("*").alias("n_tokens_distinct"),
    )
    return scored.join(norms, id_col).withColumn(
        "score_norm",
        F.when(F.col("l2") > 0, F.col("score") / F.col("l2")).otherwise(
            1.0 / F.sqrt(F.col("n_tokens_distinct"))
        ),
    )


def idf_weights(docs_tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(token, w6): integer-quantized IDF weight round(1e6 * ln(N/df)).

    Quantizing to bigint BEFORE any pair arithmetic makes every
    downstream sum/ratio bit-reproducible across engines and partition
    counts (doubles summed in different orders are not)."""
    # lazy broadcast scalar for N — same rationale as tfidf_scores
    n = docs_tokens.agg(F.count("*").cast("double").alias("_n_docs"))
    return (
        doc_frequencies(docs_tokens, id_col)
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.round(F.log(F.col("_n_docs") / F.col("df")) * 1e6)
            .cast("long")
            .alias("w6"),
        )
    )


def _pair_weighted_jaccard(pairs: DataFrame, tw: DataFrame) -> DataFrame:
    """Shared per-pair weighted-Jaccard kernel over a weighted token
    frame (id, token, w6): (id_a, id_b, w_inter, w_union, wj6).

    SPINE-PRESERVING: every input pair emits exactly one row. A side
    with no weighted tokens (empty/punctuation-only text, or every
    token pruned by the weight table's min-df) contributes totals of 0
    and the pair reports wj6=0 — the inner-join form silently DROPPED
    such pairs, the same defect class theta_pair_ops fixed."""
    per_doc = tw.groupBy("id").agg(F.sum("w6").alias("w_tot"))
    ta = tw.select(F.col("id").alias("id_a"), "token", F.col("w6").alias("w6_a"))
    tb = tw.select(F.col("id").alias("id_b"), "token")
    inter = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum("w6_a").alias("w_inter"))
    )
    sa = per_doc.select(F.col("id").alias("id_a"), F.col("w_tot").alias("w_a"))
    sb = per_doc.select(F.col("id").alias("id_b"), F.col("w_tot").alias("w_b"))
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .withColumn("w_inter", F.coalesce("w_inter", F.lit(0).cast("long")))
        .withColumn("w_a", F.coalesce("w_a", F.lit(0).cast("long")))
        .withColumn("w_b", F.coalesce("w_b", F.lit(0).cast("long")))
        .withColumn("w_union", F.col("w_a") + F.col("w_b") - F.col("w_inter"))
    )
    return out.select(
        "id_a",
        "id_b",
        "w_inter",
        "w_union",
        F.when(
            F.col("w_union") > 0,
            F.round(
                F.col("w_inter").cast("double") / F.col("w_union").cast("double") * 1e6
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("wj6"),
    )


def weighted_jaccard_for_pairs(
    pairs: DataFrame, docs_tokens: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Weighted Jaccard over distinct-token sets for given (id_a, id_b)
    pairs:  wj = Σ_{t∈A∩B} w(t) / Σ_{t∈A∪B} w(t).

    Relational all the way (explode -> weight join -> two keyed
    aggregations): no UDF, partial aggregation map-side, and the
    weights table is broadcast when small (vocabulary ≪ corpus). The
    pair-side joins shuffle on id — same shape as verify_pairs, so the
    100 TB plan is unchanged when swapping verifiers. Spine-preserving
    (see _pair_weighted_jaccard). Output:
    (id_a, id_b, w_inter, w_union, wj6)."""
    tok = docs_tokens.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct("tokens")).alias("token")
    ).join(weights, "token")
    return _pair_weighted_jaccard(pairs, tok)


def bucket_aliases(
    docs: DataFrame,
    lang_col: str = "lang",
    src_col: str = "source",
    min_docs: int = 5,
) -> DataFrame:
    """(lang, source) -> eff_source: sparse cells alias into the densest
    same-lang cell that clears min_docs (ties: source ASC); a sparse
    cell with no dense sibling keeps itself.

    Transcript analog of the reference's sparse-geohash alias merge
    (lib/lieu/spark/geo_word_index.py:18-26): geo neighbors become
    same-lang sibling cells — the statistics a sparse source can borrow
    without crossing a language boundary. All integer/deterministic, so
    the DuckDB oracle reproduces the map exactly."""
    counts = docs.groupBy(lang_col, src_col).agg(F.count("*").alias("n"))
    dense = counts.filter(F.col("n") >= min_docs)
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col).orderBy(F.col("n").desc(), F.col(src_col).asc())
    target = (
        dense.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(lang_col, F.col(src_col).alias("_tgt"))
    )
    return counts.join(target, lang_col, "left").select(
        lang_col,
        src_col,
        F.when(
            (F.col("n") < min_docs) & F.col("_tgt").isNotNull(), F.col("_tgt")
        )
        .otherwise(F.col(src_col))
        .alias("eff_source"),
    )


def bucketed_idf_weights(
    docs_tokens: DataFrame,
    aliases: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    src_col: str = "source",
) -> DataFrame:
    """(lang, eff_source, token, w6): integer-quantized IDF computed
    within each effective bucket — round(1e6 * ln(n_bucket / df_bucket)).
    The per-bucket twin of idf_weights (reference: per-geo doc
    frequencies, lib/lieu/spark/tfidf.py via geo_word_index)."""
    bucketed = docs_tokens.join(aliases, [lang_col, src_col]).select(
        id_col, "eff_source", F.col(lang_col).alias("lang"), "tokens"
    )
    n_bucket = bucketed.groupBy("lang", "eff_source").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    df = (
        bucketed.select(
            "lang", "eff_source", id_col,
            F.explode(F.array_distinct("tokens")).alias("token"),
        )
        .groupBy("lang", "eff_source", "token")
        .agg(F.count("*").alias("df"))
    )
    return df.join(n_bucket, ["lang", "eff_source"]).select(
        "lang",
        "eff_source",
        "token",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("df")) * 1e6
        )
        .cast("long")
        .alias("w6"),
    )


def blended_weighted_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    docs_tokens: DataFrame,
    min_docs: int = 5,
    proportion_num: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pair weighted Jaccard under BUCKET weights and GLOBAL weights,
    blended bucket-heavy: blended6 = floor((p*bj6 + (10-p)*gj6 + 5)/10)
    with p = proportion_num (default 6 — the reference's 0.6 geo-model
    proportion, lib/lieu/spark/dedupe.py:118-161, expressed in integer
    tenths so the blend is bit-reproducible cross-engine).

    Pairs are assumed within-bucket (planted dupes share lang/source);
    the pair's bucket weights are the id_a side's effective bucket.
    Output: (id_a, id_b, lang, eff_source, wj6_bucket, wj6_global,
    blended6)."""
    aliases = bucket_aliases(docs, min_docs=min_docs)
    meta = docs.select(id_col, "lang", "source")
    toks = docs_tokens.join(meta, id_col)
    bweights = bucketed_idf_weights(toks, aliases, id_col=id_col)
    gweights = idf_weights(docs_tokens, id_col=id_col)

    g = weighted_jaccard_for_pairs(pairs, docs_tokens, gweights, id_col=id_col)
    # bucket half: the SAME spine-preserving kernel, weighted token
    # frame keyed by (bucket, token) instead of (token) — one formula,
    # one place to fix it
    eff = toks.join(aliases, ["lang", "source"]).select(
        F.col(id_col).alias("id"), "lang", "eff_source",
        F.explode(F.array_distinct("tokens")).alias("token"),
    )
    tw = eff.join(bweights, ["lang", "eff_source", "token"]).select(
        "id", "token", "w6"
    )
    bucket_of = (
        eff.select("id", "lang", "eff_source")
        .dropDuplicates(["id"])
        .select(F.col("id").alias("id_a"), "lang", "eff_source")
    )
    # bucket_of joins LEFT: an id_a doc whose (lang, source) row is
    # missing keeps its pair (null bucket labels) instead of dropping it
    b = (
        _pair_weighted_jaccard(pairs, tw)
        .withColumnRenamed("wj6", "wj6_bucket")
        .join(bucket_of, "id_a", "left")
        .select("id_a", "id_b", "lang", "eff_source", "wj6_bucket")
    )
    # both halves preserve the spine, so this equi-join IS the spine
    out = b.join(g.select("id_a", "id_b", F.col("wj6").alias("wj6_global")),
                 ["id_a", "id_b"])
    p = proportion_num
    blended = F.floor(
        (F.lit(p) * F.col("wj6_bucket") + F.lit(10 - p) * F.col("wj6_global") + 5)
        / F.lit(10)
    ).cast("long")
    return out.withColumn("blended6", blended)


def information_gain(
    docs_tokens: DataFrame, id_col: str = "doc_id", min_count: int = 1
) -> DataFrame:
    """(token, ig) over the corpus — REFERENCE-PARITY formula
    (lib/lieu/information_gain.py:47-102, InformationGainBuilder):
    context = the other distinct tokens co-occurring in a document,

      p(x)    = docfreq(x) / num_docs          (the context marginal)
      n_y     = Σ_x co(y, x)                   (y's co-occurrence mass)
      p(x|y)  = co(y, x) / n_y                 (row-normalized PER WORD)
      ig(y)   = max(0, Σ_x p(x|y) * log2(p(x|y) / p(x)))   (SUM clamp)
      never co-occurring -> ig(y) = -log2(p(y))

    (An earlier revision normalized the joint by a GLOBAL pair total,
    divided by p(w)*p(c), and clamped per term — a PMI variant, not the
    reference's conditional-KL form; for any multi-doc corpus the two
    diverge.) ``min_count`` (P7) prunes the vocabulary up front — a
    pruned word is treated as nonexistent both as the scored word and
    as context; min_count=1 is exactly the reference.
    """
    toks = docs_tokens.select(id_col, F.array_distinct("tokens").alias("toks"))
    # num_docs as a lazy broadcast scalar (coalesce guards the empty
    # corpus) — no driver-side action during plan construction
    nd = toks.agg(
        F.coalesce(F.count("*"), F.lit(1)).cast("double").alias("_n_docs")
    )
    # marg feeds the pair prunes / p(x) / the lonely anti-join and
    # pairs feeds n_y + the joint probe: both are persisted
    # post-aggregation (vocab- and vocab-pair-bounded) so the corpus
    # explodes — in pairs' case the |toks|^2 per-doc pair stream, the
    # dominant cost — run exactly once instead of once per consumer
    # (exchange reuse does not unify differently-pruned subtrees;
    # measured on the bigram-LM chain).
    marg = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_count)
        .localCheckpoint(eager=False)
    )
    pairs = (
        toks.select(F.explode("toks").alias("w"), F.col("toks"))
        .select("w", F.explode("toks").alias("c"))
        .filter(F.col("w") != F.col("c"))
        .groupBy("w", "c")
        .agg(F.count("*").alias("co"))
        .join(marg.select("w"), "w")
        .join(marg.select(F.col("w").alias("c")), "c")
        .localCheckpoint(eager=False)
    )
    ny = pairs.groupBy("w").agg(F.sum("co").cast("double").alias("n_y"))
    pw = marg.crossJoin(F.broadcast(nd)).select(
        "w", (F.col("df") / F.col("_n_docs")).alias("p_w")
    )
    pc = pw.select(F.col("w").alias("c"), F.col("p_w").alias("p_c"))
    joint = (
        pairs.join(ny, "w")
        .join(pc, "c")
        .withColumn("p_xy", F.col("co") / F.col("n_y"))
        .withColumn(
            "term", F.col("p_xy") * F.log2(F.col("p_xy") / F.col("p_c"))
        )
    )
    ig = joint.groupBy("w").agg(
        F.greatest(F.lit(0.0), F.sum("term")).alias("ig")
    )
    # words never co-occurring (single-token docs): -log2(p(w))
    lonely = pw.join(ig, "w", "left_anti").select(
        "w", (-F.log2(F.col("p_w"))).alias("ig")
    )
    return ig.unionByName(lonely).withColumnRenamed("w", "token")


DSIR_BUCKETS = 1024
_DSIR_SALT = "dsir"


def dsir_logweights(
    docs: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram distribution is, so a
    small high-quality target set steers selection over a web-scale raw
    corpus. Features are unigrams + bigrams hashed into ``m`` buckets;
    bag-of-buckets models with Laplace smoothing are fit on the target
    rows (``is_target`` Column predicate) and the raw rows, and a doc's
    log importance weight is

        delta6(b)   = round((ln((ct_b+1)/(Nt+m)) - ln((cr_b+1)/(Nr+m))) * 1e6)
        logw6(doc)  = sum over the doc's features of delta6(bucket)

    (per-bucket integer-scaled BEFORE summing, so the doc score is exact
    integer arithmetic and engine-portable). Selection is then top-k by
    (logw6 DESC, id) — ``df.orderBy(...).limit(k)`` plans as
    TakeOrderedAndProject, per-partition top-k then a k-row driver
    merge, which is the scale-safe shape for the small k DSIR uses.

    Bucket hashing is md5-based (same recipe as sampling.hash_bucket,
    salt-domain-separated) so DuckDB re-derives every bucket. Scale
    shape: ONE map-side-combinable hash agg reduces the occurrence
    stream to persisted per-(doc, bucket) counts; the (ct, cr) bucket
    model (m-bounded -> broadcast) and the doc scores both derive from
    that cache, so the corpus is tokenized exactly once; totals are a
    lazy broadcast 1-row agg — linear, skew-free (buckets are
    near-uniform by construction), no window, no global sort.
    Zero-token docs stay visible with n_feats = 0, logw6 = 0.
    """
    from .text import tokenize

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    toks = docs.select(
        F.col(id_col).alias(id_col),
        is_target.cast("boolean").alias("__tgt"),
        tokenize(F.col(text_col)).alias("toks"),
    )
    feats = toks.select(
        id_col,
        "__tgt",
        F.explode(
            F.concat(
                F.col("toks"),
                F.expr(
                    "CASE WHEN size(toks) < 2 THEN array() "
                    "ELSE transform(sequence(2, size(toks)), "
                    "i -> concat(toks[i-2], ' ', toks[i-1])) END"
                ),
            )
        ).alias("ng"),
    ).withColumn(
        "__bkt",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(_DSIR_SALT), F.col("ng"))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(m),
        ),
    )
    # reduce the occurrence stream to per-(doc, bucket) counts ONCE and
    # persist: both the bucket model (cnt) and the doc scores (per_doc)
    # derive from dbc, and without the persist each consumer re-runs
    # the tokenize + explode pass over the whole corpus (exchange reuse
    # does not unify them — column pruning gives the subtrees different
    # canonical plans; same measured failure as bigram_lm_scores).
    # __tgt is per-doc constant so grouping by it adds no keys.
    dbc = (
        feats.groupBy(id_col, "__tgt", "__bkt")
        .agg(F.count("*").alias("__c"))
        .localCheckpoint(eager=False)
    )
    cnt = dbc.groupBy("__bkt").agg(
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("__tgt"), F.col("__c")).otherwise(0)).alias("cr"),
    )
    tot = cnt.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("_nt"),
        F.coalesce(F.sum("cr"), F.lit(0)).cast("double").alias("_nr"),
    )
    wt = cnt.crossJoin(F.broadcast(tot)).select(
        "__bkt",
        F.round(
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("_nt") + F.lit(float(m))))
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("_nr") + F.lit(float(m))))
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
            F.sum(F.col("__c") * F.col("delta6")).cast("long").alias("logw6"),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias(id_col), is_target.cast("int").alias("is_target")
        )
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "is_target",
            F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
            F.coalesce(F.col("logw6"), F.lit(0).cast("long")).alias("logw6"),
        )
    )
