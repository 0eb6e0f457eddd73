"""Cross-conversation copied-span detection (suffix-array LCS).

No lieu analog — a north_rule addition (SURVEY.md §7.1): for candidate
pairs that share material but are not wholesale duplicates, report the
longest common substring (start_a, start_b, length) so a training-data
pipeline can excise copied spans.

Physical shape: the pair table is joined to the assembled docs (J2-style
double join), then processed by ``mapInPandas`` — each Arrow batch of
pairs is handled in one Python call; per pair we build a suffix array
over text_a + SEP + text_b with a numpy doubling algorithm (O(n log n)
argsort rounds) + Kasai LCP, and take the max LCP between suffixes from
different docs. Texts are capped at ``span_max_chars`` (cost bound —
SURVEY.md §7.3 hard part d).

This implementation is intentionally independent of the pure-python
oracle in lieu_spark.oracle (different SA construction) so the unit tests
compare two genuinely separate codepaths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
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


SPAN_SCHEMA = span_schema(StringType())


def _suffix_array_np(codes: np.ndarray) -> np.ndarray:
    """Doubling suffix array; codes: int32 array (values >= 0)."""
    n = codes.shape[0]
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    tmp = np.empty(n, dtype=np.int64)
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        tmp[order[0]] = 0
        prev = order[:-1]
        curr = order[1:]
        changed = (rank[curr] != rank[prev]) | (key2[curr] != key2[prev])
        tmp[curr] = np.cumsum(changed)
        rank, tmp = tmp.copy(), rank
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def _kasai(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    n = codes.shape[0]
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def lcs_pair(text_a: str, text_b: str, max_chars: int) -> tuple[int, int, int]:
    """(start_a, start_b, length); ties -> smallest (start_a, start_b)."""
    a = text_a[:max_chars]
    b = text_b[:max_chars]
    if not a or not b:
        return (0, 0, 0)
    na = len(a)
    codes = np.empty(na + 1 + len(b), dtype=np.int32)
    codes[:na] = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32).astype(np.int32) + 1
    codes[na] = 0  # sentinel below every code point
    codes[na + 1 :] = (
        np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32).astype(np.int32) + 1
    )
    sa = _suffix_array_np(codes)
    lcp = _kasai(codes, sa)
    side = sa < na  # suffix starts in a?
    cross = side[1:] != side[:-1]
    if not cross.any():
        return (0, 0, 0)
    cand = np.nonzero(cross)[0] + 1
    lens = lcp[cand]
    best_len = int(lens.max())
    if best_len == 0:
        return (0, 0, 0)
    best = cand[lens == best_len]
    pa = np.where(side[best - 1], sa[best - 1], sa[best])
    pb = np.where(side[best - 1], sa[best], sa[best - 1]) - na - 1
    order = np.lexsort((pb, pa))[0]
    return (int(pa[order]), int(pb[order]), best_len)


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
                sa_, sb_, ln = lcs_pair(da or "", db or "", max_chars)
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


def winnow_span_candidates(
    features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id"
) -> DataFrame:
    """Span-specific blocking: a copied span barely moves whole-doc
    Jaccard, so LSH bands won't surface it. Instead build an inverted
    index over a deterministic sample of shingle hashes (winnowing /
    MOSS-style fingerprinting: keep h where pmod(h, span_sample_mod)==0),
    drop boilerplate fingerprints seen in > span_stop_docfreq docs (the
    stop-shingle analog of lieu's geo-bucket sparsity handling), and emit
    pairs sharing >= span_min_shared sampled shingles.

    A copied span of w words contributes ~(w-k+1)/span_sample_mod sampled
    shingles, so the default (mod 8, >=2 shared) detects ~40+ word spans
    with high probability; shorter spans are best-effort.
    """
    fp = features.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.col("shingle_hashes"),
                lambda h: F.pmod(h, F.lit(cfg.span_sample_mod)) == 0,
            )
        ).alias("h"),
    )
    # stop-shingle filter: count docs per fingerprint (window keeps the
    # partitioning for the subsequent self-join on h)
    freq = fp.groupBy("h").agg(F.count("*").alias("df"))
    fp = fp.join(freq.filter(F.col("df") <= cfg.span_stop_docfreq), "h")
    left = fp.select("h", F.col("id").alias("id_a"))
    right = fp.select("h", F.col("id").alias("id_b"))
    shared = (
        left.join(right, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fp"))
        .filter(F.col("shared_fp") >= cfg.span_min_shared)
    )
    return shared.select("id_a", "id_b")
