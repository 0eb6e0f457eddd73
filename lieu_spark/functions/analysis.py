"""Text-analysis functions for training-data pipelines.

All JVM-side Catalyst expressions (no UDFs): language-ID n-gram/stopword
heuristic, quality scoring, token counting (whitespace + BPE-ish regex),
document fingerprinting. Each has an exact DuckDB-SQL twin in
lieu_spark/oracle_sql.py so the driver's oracle can verify values.

Ratio outputs are scaled to integers (x 1e6, bigint) to keep the
driver's value-hash comparison exact across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import tokenize

# BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
BPE_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "los", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break priority


def ws_token_count(text: Column) -> Column:
    return F.size(tokenize(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens on the lowercased raw text."""
    return F.size(
        F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(BPE_PATTERN), 0)
    ).cast("long")


def _ratio6(num: Column, den: Column) -> Column:
    """round(1e6 * num/den) as bigint; 0 when den == 0."""
    return F.when(
        den > 0, F.round(num.cast("double") * 1e6 / den.cast("double")).cast("long")
    ).otherwise(F.lit(0).cast("long"))


def quality_columns(text: Column) -> dict[str, Column]:
    """Length/punct/stopword-ratio quality features (integer-scaled).

    ENGLISH-CENTRIC BY DESIGN, like the C4/Gopher rules it mirrors:
    alpha counts [a-z] only and the punct ratio treats every non-ASCII
    letter as punctuation, so accented/CJK text scores low — gate
    multilingual corpora per-language (route through lang_guess first)
    or recalibrate thresholds per corpus (CLAUDE.md notes the same for
    the bigram-LM score). Kept ASCII-only deliberately: the scores are
    exact integer math replayed by the DuckDB oracle, and Java-regex vs
    RE2 unicode-class semantics do not agree bit-for-bit."""
    raw = F.coalesce(text, F.lit(""))
    n_chars = F.length(raw).cast("long")
    toks = tokenize(text)
    n_tokens = F.size(toks).cast("long")
    alpha_chars = F.length(F.regexp_replace(F.lower(raw), r"[^a-z]", "")).cast("long")
    punct_chars = F.length(
        F.regexp_replace(raw, r"[a-zA-Z0-9\s]", "")
    ).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))
    ).cast("long")
    mean_tok_len6 = _ratio6(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)),
        n_tokens,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio6": _ratio6(alpha_chars, n_chars),
        "punct_ratio6": _ratio6(punct_chars, n_chars),
        "stopword_ratio6": _ratio6(stop_hits, n_tokens),
        "mean_token_len6": mean_tok_len6,
    }


def quality_score6(text: Column) -> Column:
    """Composite quality in [0, 1e6]: rewards alpha-heavy, stopword-bearing,
    mid-length docs; penalizes punctuation soup. Deterministic integer."""
    q = quality_columns(text)
    length_term = F.least(q["n_tokens"], F.lit(100)).cast("double") / 100.0
    alpha_term = q["alpha_ratio6"].cast("double") / 1e6
    stop_term = F.least(q["stopword_ratio6"].cast("double") / 1e6 * 4.0, F.lit(1.0))
    punct_pen = q["punct_ratio6"].cast("double") / 1e6
    score = (0.3 * length_term + 0.4 * alpha_term + 0.3 * stop_term) * (
        1.0 - F.least(punct_pen * 2.0, F.lit(1.0))
    )
    return F.round(score * 1e6).cast("long")


def gopher_rules(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, adapted to this
    corpus): word-count bounds, mean-word-length band, minimum stopword
    evidence, minimum alphabetic-word fraction. Emits the underlying
    signals, one int flag per rule, and ``keep`` = all rules pass —
    int (not boolean) so the driver's type-sensitive value hash matches
    DuckDB exactly. Pure Catalyst over a staged token array: one
    projection, no shuffle, map-side only."""
    d = docs.withColumn("__toks", tokenize(F.col(text_col)))
    toks = F.col("__toks")
    n = F.size(toks).cast("long")
    mean6 = _ratio6(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)),
        n,
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    alpha6 = _ratio6(alpha_words, n)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))).cast("long")
    r_len = ((n >= 50) & (n <= 100000)).cast("int")
    r_mean = ((mean6 >= 3000000) & (mean6 <= 10000000)).cast("int")
    r_stop = (stops >= 2).cast("int")
    r_alpha = (alpha6 >= 800000).cast("int")
    # derived FROM the flag expressions, never re-stated: a threshold
    # tweak that edited only one copy of the predicates would silently
    # make keep disagree with the audit flags it summarizes
    keep = ((r_len + r_mean + r_stop + r_alpha) == 4).cast("int")
    return d.select(
        F.col(id_col),
        n.alias("n_tokens"),
        mean6.alias("mean_token_len6"),
        alpha6.alias("alpha_word_ratio6"),
        stops.alias("stop_hits"),
        r_len.alias("r_len"),
        r_mean.alias("r_mean"),
        r_stop.alias("r_stop"),
        r_alpha.alias("r_alpha"),
        keep.alias("keep"),
    )


def stopword_hits(text: Column, lang: str) -> Column:
    toks = tokenize(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang]))).cast("long")


def lang_guess(text: Column) -> Column:
    """Stopword-vote language ID. ASCII-poor text -> 'other'; no stopword
    hits at all -> 'unknown'; ties broken by LANG_ORDER."""
    raw = F.coalesce(text, F.lit(""))
    n_chars = F.length(raw)
    ascii_chars = F.length(F.regexp_replace(raw, r"[^\x00-\x7F]", ""))
    hits = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = hits[LANG_ORDER[0]]
    best_lang = F.lit(LANG_ORDER[0])
    for lang in LANG_ORDER[1:]:
        cond = hits[lang] > best
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best = F.when(cond, hits[lang]).otherwise(best)
    guess = F.when(best > 0, best_lang).otherwise(F.lit("unknown"))
    return F.when(
        (n_chars > 0) & (ascii_chars.cast("double") / n_chars.cast("double") < 0.5),
        F.lit("other"),
    ).otherwise(guess)


def repetition_signals(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher/C4-style repetition signals per doc: top-bigram and
    duplicate-bigram fractions — the boilerplate / loop-generation
    filter signals LLM corpora are screened with. Docs with fewer than
    two tokens produce no row (callers left-join and zero-fill). Tokens
    are staged as a plain column BEFORE the bigram higher-order
    transform (a computed expression referenced inside a HOF lambda
    re-evaluates per element); the explode + two-level agg shuffles on
    (doc_id) with map-side combine — the same shape at any corpus
    size."""
    d2 = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("toks")
    ).filter(F.size("toks") >= 2)
    big = d2.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                ),
            )
        ).alias("bg"),
    )
    cnt = big.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
        F.max("c").alias("top_cnt"),
    )
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "n_distinct_bigrams",
        _ratio6(F.col("top_cnt"), F.col("n_bigrams")).alias("top_bigram_ratio6"),
        _ratio6(
            F.col("n_bigrams") - F.col("n_distinct_bigrams"), F.col("n_bigrams")
        ).alias("dup_bigram_ratio6"),
    )


MOD31 = (1 << 31) - 1


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial hash over canonical tokens:
    acc = (acc * 131 + xxhash64(token) mod 2^31) mod (2^31 - 1).
    Intermediates stay < 2^39 so ANSI-mode long arithmetic never
    overflows. Pure JVM (aggregate higher-order fn)."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 131 + F.pmod(F.xxhash64(t), F.lit(1 << 31)))
        % F.lit(MOD31),
    )


def bigram_lm_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Model-based quality scoring (the perplexity-proxy filter of
    CCNet-style pipelines): a bigram language model with Laplace
    smoothing is trained on the corpus itself in two map-side-combinable
    aggregations, then every doc is scored by its mean bigram
    log-likelihood — documents full of rare word sequences (garbled
    text, boilerplate noise) score low and can be filtered or bucketed.

        score6(w1 w2) = round(ln((c(w1,w2) + 1) / (c(w1,·) + V)) * 1e6)
        lm_score6(doc) = round(avg over the doc's bigrams)

    All Catalyst: bigrams via a transform over token indices (no
    window, no shuffle before the count aggs), vocabulary size V as a
    LAZY broadcast 1-row aggregate (no action at plan time), integer-
    scaled scores so the DuckDB twin is value-exact. Docs with fewer
    than two tokens have no bigrams and drop out (the twin mirrors
    this).

    Scale shape: the occurrence stream is FIRST reduced to per-(doc,
    w1, w2) counts — one map-side-combinable hash agg — and the result
    is PERSISTED: dwc feeds three consumers (bc, cc via bc, the probe
    side of the score join) and Catalyst's exchange reuse does NOT
    unify them (column pruning gives each subtree a different output
    list, so the canonical plans differ — measured: 4 corpus scans,
    0 ReusedExchange without the persist; 2 scans with it, the other
    being the cheap vocab pass). MEMORY_AND_DISK keeps lineage so a
    lost executor recomputes instead of failing the job. bc = sum over
    docs, cc = sum over w2 of bc (model-vocab-sized), and the join
    back is one equi-join on the composite (w1, w2) key whose
    distribution is near-uniform. Nothing ever joins the doc-level stream on the bare w1
    key (the hot-stopword skew axis — 'the' as a join key would hash
    every occurrence in the corpus to one reducer). The per-doc score
    is the k-weighted mean, identical to the per-occurrence mean:
    score6 is an exact integer per distinct bigram, and both engines'
    double accumulations of |score6| <= ~2e7 over <= ~1e6-bigram docs
    stay under 2^53, so round() agrees bit-for-bit with the twin's
    avg-over-occurrences.
    """
    toks = docs.select(
        F.col(id_col).alias(id_col), tokenize(F.col(text_col)).alias("toks")
    )
    big = toks.select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(2, size(toks)), "
                "i -> struct(toks[i-2] AS w1, toks[i-1] AS w2)) END"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # localCheckpoint (lazy), NOT persist: the reuse story is the same
    # (materialize once at first action, every consumer reads blocks)
    # but persist() registers in the CacheManager, which holds the
    # entry until an explicit unpersist — a function-local handle never
    # escapes, so chained sessions leaked one corpus-scale cached
    # table per call. localCheckpoint blocks are reference-tracked and
    # freed when the plan is released (same reasoning as curate's
    # stage() and refresh's internals; applied to every multi-consumer
    # reduced frame in weighting.py too).
    dwc = big.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("k")).localCheckpoint(
        eager=False
    )
    bc = dwc.groupBy("w1", "w2").agg(F.sum("k").alias("c"))
    cc = bc.groupBy("w1").agg(F.sum("c").alias("c_ctx"))
    vocab = toks.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").cast("double").alias("_v")
    )
    model = (
        bc.join(cc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("c_ctx") + F.col("_v")))
                * 1e6
            )
            .cast("long")
            .alias("score6"),
        )
    )
    scored = dwc.join(model, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"),
        F.round(F.sum(F.col("k") * F.col("score6")) / F.sum("k"))
        .cast("long")
        .alias("lm_score6"),
    )
