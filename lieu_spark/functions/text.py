"""Text canonicalization + shingling as pure Catalyst expressions.

The reference runs libpostal's C tokenizer per record through a Python
closure (/root/reference/lib/lieu/dedupe.py:328-331 via spark/dedupe.py:96).
We instead stay JVM-side: lower + unicode regex + split + higher-order
array functions, so the whole shingle stage lives inside WholeStageCodegen
and the parquet scan only reads the text column.

Unit semantics (must match lieu_spark.oracle exactly):
  canonicalize: lower, [^\\p{L}\\p{N}]+ -> ' ', trim, collapse
  tokens:       split on single space, [] for empty
  shingles:     ordered k-word windows; <k tokens -> 1 shingle; 0 -> []
  shingle_hashes: distinct xxhash64(shingle), sorted ascending
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CANON_PATTERN = r"[^\p{L}\p{N}]+"


def canonicalize(text: Column) -> Column:
    c = F.lower(F.coalesce(text, F.lit("")))
    c = F.regexp_replace(c, CANON_PATTERN, " ")
    return F.trim(c)


def normalize_template(text: Column) -> Column:
    """Template-normalized form for the normalize-then-exact-hash dedupe
    tier (the Falcon/RefinedWeb recipe): lowercase, digit runs removed,
    whitespace collapsed, trimmed — collapses docs that differ only in
    counters / ids / timestamps, which byte-exact sha dedupe misses.
    Kept to three regexp passes so it stays whole-stage-codegen'd; the
    DuckDB oracle twin applies the identical chain."""
    c = F.lower(F.coalesce(text, F.lit("")))
    c = F.regexp_replace(c, r"[0-9]+", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokenize(text: Column) -> Column:
    """array<string> of canonical tokens ([] for empty/null text).

    Single regex pass: split the lowercased text on non-alnum runs and
    drop empty segments — token-identical to splitting canonicalize()'s
    output (one regexp_replace saved per doc; the feature stage is
    regex-bound at scale)."""
    parts = F.split(F.lower(F.coalesce(text, F.lit(""))), CANON_PATTERN)
    return F.filter(parts, lambda t: t != "")


def verbatim_ngram_keys(toks: Column, n: int) -> Column:
    """Distinct fixed-width join keys for the exact n-token windows of a
    doc — array<string> of ``substring(md5(join(window, ' ')), 1, 16)``.

    The GPT-3-style verbatim decontamination rule (n=13) joins on these
    16-char hex prefixes instead of the n-word strings themselves, so
    the shuffle carries fixed-width keys. md5 (not xxhash64) keeps the
    DuckDB oracle twin pure SQL. Docs shorter than n tokens emit no
    keys.

    IMPORTANT: pass a *materialized column* of tokens, not an inline
    expression — a computed outer expression referenced inside the
    transform() lambda re-evaluates per element (see shingle_hash_set).
    """
    win = F.transform(
        F.sequence(F.lit(n), F.size(toks)),
        lambda i: F.substring(
            F.md5(F.array_join(F.slice(toks, i - (n - 1), n), " ")), 1, 16
        ),
    )
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(win)
    )


def token_hashes(toks: Column) -> Column:
    """xxhash64 per token (duplicates kept, order kept) — array<long>.
    One string-hash pass shared by shingling AND SimHash."""
    return F.transform(toks, lambda t: F.xxhash64(t))


def shingle_hash_set(tok_hashes: Column, k: int) -> Column:
    """Distinct shingle hashes, sorted — array<long>.

    Shingle identity = the ordered k-tuple of token hashes, keyed by
    ``xxhash64(slice(token_hashes, i, k))`` (Spark chains array elements
    with seed 42; oracle twin: hashing.xxh64_chain). Avoids building the
    k-word shingle *strings* entirely — no concat/UTF-8 re-hash per
    window, ~4x cheaper than the string formulation on 300-token docs.

    IMPORTANT: pass a *materialized column* of token hashes, not an
    inline expression — a computed outer expression referenced inside
    the transform() lambda is re-evaluated per element (measured 26x
    slowdown; see BENCH.md).

    <k tokens -> one shingle of everything; 0 -> [].
    """
    n = F.size(tok_hashes)
    # window hash via k element_at args, NOT xxhash64(slice(...)): Spark's
    # hash of multiple children folds them one value at a time exactly
    # like the elements of one array child, so the two forms are
    # bit-identical — but the slice form allocates a fresh k-element
    # array per window and measured 8x slower on the feature stage
    # (6.8 s -> 0.85 s for the window pass at sf0.1; parity-checked
    # corpus-wide, zero mismatching rows).
    windows = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.xxhash64(
            *[F.element_at(tok_hashes, i + j + 1) for j in range(k)]
        ),
    )
    return (
        F.when(n == 0, F.array().cast("array<long>"))
        .when(n < k, F.array(F.xxhash64(tok_hashes)))
        # sort_array, not array_sort: array_sort materializes its default
        # comparator as an interpreted lambda invoked per comparison,
        # while sort_array uses the native type ordering — measured ~30%
        # faster on the shingle pass, and identical output here because
        # hash arrays cannot contain nulls (the two functions differ
        # only in null placement).
        .otherwise(F.sort_array(F.array_distinct(windows)))
    )


def token_char_len(toks: Column) -> Column:
    """Total characters across tokens — EXACTLY ``length(canon_nospace(text))``
    without the two extra full-document regex passes canon_nospace costs:
    tokens are precisely the alphanumeric runs of the lowered text, and
    the space-stripped canonical form is their concatenation, so the
    lengths agree character for character. Lets the char-fallback ratio
    tests run on every row while the canonical no-space string itself is
    built only for the rows whose gram branch actually consumes it."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t).cast("long"),
    )


def canon_nospace(text: Column) -> Column:
    """Canonical text with spaces stripped — the unit char k-grams run
    over (re-joins punctuation-split CJK clauses into one stream)."""
    return F.regexp_replace(canonicalize(text), " ", "")


def char_kgram_hash_set(c: Column, k: int) -> Column:
    """Distinct xxhash64 of character k-grams over a *staged*
    space-stripped canonical column — array<long>, sorted.

    The no-space-script fallback: an unpunctuated CJK sentence is ONE
    token under the ``[^\\p{L}\\p{N}]+`` split (the reference leans on
    libpostal's language-aware tokenizer here,
    /root/reference/lib/lieu/dedupe.py:328-331), so word-shingle
    near-dup detection degenerates to exact match. Char k-grams restore
    sub-document granularity. Oracle twin: oracle.char_kgram_hashes
    (xxh64 over the UTF-8 bytes of each window).

    Pass a materialized column, not an inline expression (the
    shingle_hash_set staging rule — HOF lambdas re-evaluate outer
    computed expressions per element).

    <k chars -> one gram of everything; 0 -> [].
    """
    n = F.length(c)
    windows = F.transform(
        F.sequence(F.lit(1), n - F.lit(k) + 1),
        lambda i: F.xxhash64(F.substring(c, i, F.lit(k))),
    )
    return (
        F.when(n == 0, F.array().cast("array<long>"))
        .when(n < k, F.array(F.xxhash64(c)))
        # sort_array for the same no-nulls + native-ordering reason as
        # shingle_hash_set
        .otherwise(F.sort_array(F.array_distinct(windows)))
    )


def char_fallback_cond_len(nchars: Column, toks: Column, avg_len: float) -> Column:
    """``char_fallback_cond`` with the canonical no-space LENGTH supplied
    as a column (token_char_len) instead of the string itself — the same
    division-form arithmetic on the same integer operands, so the truth
    value is bit-identical while the canon_ns string is not needed."""
    nt = F.size(toks)
    return (nt > 0) & (
        (nchars.cast("double") / nt.cast("double")) >= F.lit(avg_len)
    )


def char_fallback_band_len(
    nchars: Column, toks: Column, avg_len: float, hysteresis: float
) -> Column:
    """``char_fallback_band`` on a precomputed length column — identical
    multiplicative-form arithmetic (see char_fallback_band for why the
    division form is unsafe under CSE + ANSI)."""
    if hysteresis <= 0:
        return F.lit(False)
    nt = F.size(toks)
    ntd = nt.cast("double")
    ln = nchars.cast("double")
    return (
        (nt > 0)
        & (ln >= F.lit(avg_len * (1.0 - hysteresis)) * ntd)
        & (ln < F.lit(avg_len * (1.0 + hysteresis)) * ntd)
    )


def char_fallback_cond(canon_ns: Column, toks: Column, avg_len: float) -> Column:
    """True when the doc's PRIMARY family is char k-grams: non-empty and
    the mean chars-per-token ratio >= avg_len (latin text sits ~5-6;
    unsegmented CJK clauses are 10+). Oracle twin:
    oracle.use_char_fallback."""
    nt = F.size(toks)
    return (nt > 0) & (
        (F.length(canon_ns).cast("double") / nt.cast("double")) >= F.lit(avg_len)
    )


def char_fallback_band(
    canon_ns: Column, toks: Column, avg_len: float, hysteresis: float
) -> Column:
    """True when the doc sits in the hysteresis band
    [avg*(1-h), avg*(1+h)) around the fallback boundary and must emit
    BOTH gram families: a per-doc threshold always has a boundary, and a
    near-dup pair straddling it would otherwise land in disjoint hash
    families with guaranteed Jaccard 0. Oracle twin:
    oracle.in_fallback_band."""
    if hysteresis <= 0:
        return F.lit(False)
    # multiplicative form (len >= lo*nt), NOT a shared ratio division:
    # a ratio column referenced by both comparisons gets hoisted by
    # common-subexpression elimination ABOVE the short-circuiting AND,
    # so ANSI mode throws DIVIDE_BY_ZERO on empty-token docs
    nt = F.size(toks)
    ntd = nt.cast("double")
    ln = F.length(canon_ns).cast("double")
    return (
        (nt > 0)
        & (ln >= F.lit(avg_len * (1.0 - hysteresis)) * ntd)
        & (ln < F.lit(avg_len * (1.0 + hysteresis)) * ntd)
    )


def with_text_features(df, text_col: str, k: int):
    """Attach tokens / token_hashes / shingle_hashes in staged columns
    (staging matters — see shingle_hash_set docstring)."""
    return (
        df.withColumn("tokens", tokenize(F.col(text_col)))
        .withColumn("token_hashes", token_hashes(F.col("tokens")))
        .withColumn("shingle_hashes", shingle_hash_set(F.col("token_hashes"), k))
    )


def safe_decode(b: Column) -> Column:
    """bytes -> string with UTF-8-first, latin-1 fallback — the
    reference's safe_decode (lib/lieu/encoding.py:8-21: try utf-8,
    on UnicodeDecodeError decode latin-1). Pure Catalyst: a binary
    cast to string wraps the bytes unvalidated, ``is_valid_utf8``
    checks them, and ISO-8859-1 decode never fails (all 256 byte
    values map) — no UDF, no per-row Python, ANSI-safe (a strict
    ``decode(b, 'UTF-8')`` would throw MALFORMED_CHARACTER_CODING
    on exactly the rows the fallback exists for)."""
    s_raw = b.cast("string")
    return F.when(F.is_valid_utf8(s_raw), s_raw).otherwise(
        F.decode(b, "ISO-8859-1")
    )


def is_utf8(b: Column) -> Column:
    """True iff the bytes are valid UTF-8 (the safe_decode branch)."""
    return F.is_valid_utf8(b.cast("string"))
