"""Cross-conversation copied-span detection (longest common substring).

No lieu analog — a north_rule addition (SURVEY.md §7.1): for candidate
pairs that share material but are not wholesale duplicates, report the
longest common substring (start_a, start_b, length) so a training-data
pipeline can excise copied spans.

Physical shape: the pair table is joined to the assembled docs (J2-style
double join), then processed by ``mapInPandas`` — each Arrow batch of
pairs is handled in one Python call; per pair the longest common
substring is found by binary search over the length with vectorized
rolling-hash window intersection (verified against real substrings, so
hash collisions cannot produce false spans). Texts are capped at
``span_max_chars`` (cost bound — SURVEY.md §7.3 hard part d).

This implementation is intentionally independent of the pure-python
oracle in lieu_spark.oracle (suffix array + Kasai) so the unit tests
compare two genuinely separate algorithms.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
)

from ..config import DedupeConfig

def span_schema(id_type) -> StructType:
    """Output schema follows the caller's id type (conv_id strings for
    transcripts, int64 doc ids for the documents surrogate)."""
    return StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("start_a", IntegerType()),
            StructField("start_b", IntegerType()),
            StructField("length", IntegerType()),
        ]
    )



_B = np.uint64(1099511628211)  # odd multiplier -> invertible mod 2**64
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))

# power tables are text-independent: grow-once process-local cache keyed
# by required length (one pair of multiply.accumulate passes per worker
# lifetime instead of two per TEXT — measurable at ~0.7 ms/pair)
_POW_CACHE: dict[str, np.ndarray] = {}


def _pows(n: int) -> tuple[np.ndarray, np.ndarray]:
    cached = _POW_CACHE.get("b")
    if cached is None or cached.shape[0] < n:
        size = max(n, 4096)
        with np.errstate(over="ignore"):
            bp = np.full(size, _B, dtype=np.uint64)
            bp[0] = 1
            _POW_CACHE["b"] = np.multiply.accumulate(bp)
            bi = np.full(size, _BINV, dtype=np.uint64)
            bi[0] = 1
            _POW_CACHE["binv"] = np.multiply.accumulate(bi)
    return _POW_CACHE["b"][:n], _POW_CACHE["binv"][:n]


def _hash_arrays(s: str) -> tuple[np.ndarray, np.ndarray]:
    """(c, b_pows) such that the canonical polynomial hash of the
    window s[i:i+L], sum_k code[i+k] * B^k (mod 2**64), equals
    (c[i+L] - c[i]) * b_pows[i]. Fully vectorized: odd B is invertible
    mod 2**64, so u[j] = code[j] * Binv^j makes windows cumsum-able."""
    codes = (
        np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        + np.uint64(1)
    )
    n = codes.shape[0]
    b_pows, binv_pows = _pows(n)
    with np.errstate(over="ignore"):
        u = codes * binv_pows
        c = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(u, out=c[1:])
    return c, b_pows


def _window_hashes(c: np.ndarray, b_pows: np.ndarray, L: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (c[L:] - c[:-L]) * b_pows[: c.shape[0] - L]


def lcs_pair(
    text_a: str, text_b: str, max_chars: int, min_len: int = 1
) -> tuple[int, int, int]:
    """(start_a, start_b, length) of a longest common substring.

    Binary search over the length with vectorized rolling-hash window
    intersection (numpy uint64 wrap-around), candidate positions
    verified by direct string comparison (hash collisions rejected).
    O((n+m) log min(n,m)) with all heavy work in numpy — replaced a
    suffix-array+Kasai formulation whose O(n) Python Kasai loop
    dominated the span stage.

    ``min_len > 1`` (the caller's reporting threshold) adds one probe at
    min_len first: pairs with no common window that long return (0,0,0)
    after a single intersection instead of a full bisection (measured
    ~9x cheaper on span-free pairs), and the bisection range for the
    rest starts at min_len. Pairs whose LCS is shorter than min_len
    return (0, 0, 0) rather than the (sub-threshold) exact length.
    (A galloping variant was measured SLOWER on span-rich candidate
    sets — winnowing has few false positives, so almost every pair pays
    the gallop's extra bracketing probes.)
    """
    a = text_a[:max_chars]
    b = text_b[:max_chars]
    if not a or not b:
        return (0, 0, 0)
    ca, pows_a = _hash_arrays(a)
    cb, pows_b = _hash_arrays(b)

    def probe(L: int) -> tuple[int, int] | None:
        ha = _window_hashes(ca, pows_a, L)
        hb = _window_hashes(cb, pows_b, L)
        common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
        if common.size == 0:
            return None
        # verify (collision safety); first few candidates suffice
        order = np.lexsort((ib, ia))
        for k in order[:8]:
            i, j = int(ia[k]), int(ib[k])
            if a[i : i + L] == b[j : j + L]:
                return (i, j)
        # all sampled candidates were collisions — exhaustive verify
        for k in order:
            i, j = int(ia[k]), int(ib[k])
            if a[i : i + L] == b[j : j + L]:
                return (i, j)
        return None

    lo, hi = 0, min(len(a), len(b))  # invariant: lo is achievable
    best = (0, 0)
    if min_len > 1:
        if min_len > hi:
            return (0, 0, 0)
        hit = probe(min_len)
        if hit is None:
            return (0, 0, 0)
        best, lo = hit, min_len
    while lo < hi:
        mid = (lo + hi + 1) // 2
        hit = probe(mid)
        if hit is not None:
            best = hit
            lo = mid
        else:
            hi = mid - 1
    if lo == 0:
        return (0, 0, 0)
    return (best[0], best[1], lo)


def copied_spans(
    pairs_with_text: DataFrame, cfg: DedupeConfig
) -> DataFrame:
    """(id_a, id_b, doc_a, doc_b) -> spans >= span_min_len chars."""
    max_chars = cfg.span_max_chars
    min_len = cfg.span_min_len

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_a, id_b, da, db in zip(
                pdf["id_a"], pdf["id_b"], pdf["doc_a"], pdf["doc_b"]
            ):
                sa_, sb_, ln = lcs_pair(da or "", db or "", max_chars, min_len)
                if ln >= min_len:
                    rows.append((id_a, id_b, sa_, sb_, ln))
            yield pd.DataFrame(
                rows, columns=["id_a", "id_b", "start_a", "start_b", "length"]
            )

    selected = pairs_with_text.select("id_a", "id_b", "doc_a", "doc_b")
    # suffix-array cost is per-PAIR CPU, not bytes: repartition explicitly
    # so AQE's byte-based coalescing can't serialize the LCS stage
    sc = selected.sparkSession.sparkContext
    selected = selected.repartition(max(2 * sc.defaultParallelism, 8))
    schema = span_schema(selected.schema["id_a"].dataType)
    return selected.mapInPandas(compute, schema)


def span_candidates(verified: DataFrame, cfg: DedupeConfig) -> DataFrame:
    """Pairs worth scanning for copied spans: sharing material
    (jaccard >= span_low) but not wholesale near-identical."""
    return verified.filter(
        (F.col("jaccard") >= cfg.span_low) & (F.col("jaccard") < cfg.threshold_likely)
    ).select("id_a", "id_b")


def sample_filter(hashes, cfg: DedupeConfig):
    """The winnowing sample predicate applied to a hash array column:
    keep h where pmod(h, span_sample_mod) == 0. IDEMPOTENT — applying
    it to an already-sampled array is a no-op, which is what lets
    callers pre-sample a narrow projection before an expensive shuffle
    (pipeline build_spans) and still feed the result through
    winnow_fingerprints unchanged."""
    return F.filter(
        hashes, lambda h: F.pmod(h, F.lit(cfg.span_sample_mod)) == 0
    )


def winnow_fingerprints(
    features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id"
) -> DataFrame:
    """(id, h): the deterministic fingerprint sample of each doc's
    shingle hashes (winnowing/MOSS-style: keep h where
    pmod(h, span_sample_mod)==0). Split out so the driver contract can
    export it for the DuckDB oracle (lieu_spark.oracle_export)."""
    return features.select(
        F.col(id_col).alias("id"),
        F.explode(sample_filter(F.col("shingle_hashes"), cfg)).alias("h"),
    )


def winnow_pairs_from_fingerprints(
    fp: DataFrame, cfg: DedupeConfig, keep_counts: bool = False
) -> DataFrame:
    """(id, h) fingerprints -> candidate pairs sharing >= span_min_shared
    sampled shingles, after dropping boilerplate fingerprints seen in
    > span_stop_docfreq docs. ``keep_counts`` retains shared_fp for the
    oracle-checked driver query."""
    # stop-shingle filter as a WINDOW count, not groupBy+join-back: one
    # exchange on h that stays partitioned for the self-join below, and
    # the identical left/right subplans become a ReusedExchange instead
    # of recomputing the explode lineage per side (was 4 full passes;
    # .explain-driven rewrite, same pattern as lsh._salted)
    w = Window.partitionBy("h")
    fp = fp.withColumn("df", F.count("*").over(w)).filter(
        F.col("df") <= cfg.span_stop_docfreq
    )
    left = fp.select("h", F.col("id").alias("id_a"))
    right = fp.select("h", F.col("id").alias("id_b"))
    shared = (
        left.join(right, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fp"))
        .filter(F.col("shared_fp") >= cfg.span_min_shared)
    )
    if keep_counts:
        return shared.select("id_a", "id_b", "shared_fp")
    return shared.select("id_a", "id_b")


def winnow_span_candidates(
    features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id"
) -> DataFrame:
    """Span-specific blocking: a copied span barely moves whole-doc
    Jaccard, so LSH bands won't surface it. Instead build an inverted
    index over a deterministic sample of shingle hashes (winnowing /
    MOSS-style fingerprinting), drop boilerplate fingerprints seen in
    > span_stop_docfreq docs (the stop-shingle analog of lieu's
    geo-bucket sparsity handling), and emit pairs sharing >=
    span_min_shared sampled shingles.

    A copied span of w words contributes ~(w-k+1)/span_sample_mod sampled
    shingles, so the default (mod 8, >=2 shared) detects ~40+ word spans
    with high probability; shorter spans are best-effort.
    """
    return winnow_pairs_from_fingerprints(
        winnow_fingerprints(features, cfg, id_col), cfg
    )


def remove_copied_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "doc",
) -> DataFrame:
    """Exact-substring dedupe REMOVAL: the canonical side of every span
    pair (``id_a`` — the smaller id, the pair convention everywhere in
    this engine) keeps its text; the copy side (``id_b``) has
    ``[start_b, start_b + length)`` cut out. A doc reported as the copy
    in several pairs gets every cut: intervals are first merged into
    disjoint runs (adjacent intervals coalesce) with one sort window +
    running max, then all cuts apply in ONE pass — an ``F.aggregate``
    fold over the ordered interval array that concatenates the gap
    segments (character-offset ``substring``, matching the 0-based
    character offsets ``lcs_pair`` reports).

    Pure Catalyst: one window, one groupBy, one left join, no Python —
    the scale shape is the spans table (tiny relative to the corpus)
    shuffled by doc id, then a narrow projection over the docs.
    Docs with no spans pass through unchanged with ``n_cut = 0``.
    """
    iv = spans.select(
        F.col("id_b").alias(id_col),
        F.col("start_b").cast("long").alias("s"),
        (F.col("start_b") + F.col("length")).cast("long").alias("e"),
    )
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_grp = F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    grp = F.sum(new_grp).over(w.rowsBetween(Window.unboundedPreceding, 0))
    merged = (
        iv.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("cuts"))
    )
    joined = docs.join(merged, id_col, "left")
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cur"), F.lit("").alias("acc_out")
    )
    folded = F.aggregate(
        F.col("cuts"),
        acc0,
        lambda acc, c: F.struct(
            c["e"].alias("cur"),
            F.concat(
                acc["acc_out"],
                F.col(doc_col).substr(
                    (acc["cur"] + 1).cast("int"), (c["s"] - acc["cur"]).cast("int")
                ),
            ).alias("acc_out"),
        ),
        lambda acc: F.concat(
            acc["acc_out"],
            F.col(doc_col).substr(
                (acc["cur"] + 1).cast("int"), F.length(F.col(doc_col))
            ),
        ),
    )
    return joined.select(
        id_col,
        F.coalesce(F.size("cuts"), F.lit(0)).cast("long").alias("n_cut"),
        F.coalesce(folded, F.col(doc_col)).alias("doc_scrubbed"),
    )
