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


def tokenize(text: Column) -> Column:
    """array<string> of canonical tokens ([] for empty/null text)."""
    c = canonicalize(text)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, " ")
    )


def shingle_strings(toks: Column, k: int) -> Column:
    """Ordered k-word shingles as array<string> (duplicates kept)."""
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.concat_ws(" ", toks)))
        .otherwise(windows)
    )


def shingle_hash_set(toks: Column, k: int) -> Column:
    """Distinct xxhash64 of each distinct shingle, sorted — array<long>.

    This is the per-doc set MinHash consumes and exact-Jaccard verification
    intersects. Sorted ascending so the column is deterministic for
    value-hash comparison and resume byte-equality.
    """
    sh = shingle_strings(toks, k)
    return F.array_sort(
        F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))
    )


def with_text_features(df, text_col: str, k: int):
    """Attach tokens / shingle_hashes columns in one projection."""
    toks = tokenize(F.col(text_col))
    return df.withColumn("tokens", toks).withColumn(
        "shingle_hashes", shingle_hash_set(F.col("tokens"), k)
    )
