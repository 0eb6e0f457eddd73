"""SimHash (64-bit) as an Arrow-batched pandas UDF.

The near-exact text path — capability parity with the reference's
expansion-equality "exact dupe" checks (libpostal ``is_name_duplicate`` et
al., /root/reference/lib/lieu/dedupe.py:7,41) which catch records whose
normalized forms are identical-or-trivially-different. SimHash hamming
distance <= k generalizes that to near-identical token distributions.

Token hashes are computed JVM-side (``F.xxhash64`` per token, duplicates
kept so term frequency weights the bits); the UDF only does the bit
accumulation, vectorized with ``np.add.reduceat`` over the whole batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..config import DedupeConfig

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def _simhash_batch(arrays: pd.Series) -> pd.Series:
    n = len(arrays)
    out = np.zeros(n, dtype=np.int64)
    lens = np.fromiter((len(v) for v in arrays), dtype=np.int64, count=n)
    idx = np.nonzero(lens > 0)[0]
    if idx.size:
        flat = np.concatenate(
            [np.asarray(arrays.iat[i], dtype=np.int64) for i in idx]
        ).view(np.uint64)
        starts = np.zeros(idx.size, dtype=np.intp)
        np.cumsum(lens[idx][:-1], out=starts[1:])
        half = lens[idx]
        packed = np.zeros(idx.size, dtype=np.uint64)
        # per-bit 1-D passes keep every reduceat contiguous (a 2-D
        # axis-0 reduceat strides column-wise and is ~30x slower)
        for b in range(64):
            col = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.uint8)
            ones = np.add.reduceat(col, starts, dtype=np.int64)
            # bit set iff strictly more ones than zeros
            packed |= ((2 * ones) > half).astype(np.uint64) << np.uint64(b)
        out[idx] = packed.view(np.int64)
    return pd.Series(out)


def make_simhash_udf():
    @F.pandas_udf(LongType())
    def simhash_udf(token_hashes: pd.Series) -> pd.Series:
        return _simhash_batch(token_hashes)

    return simhash_udf


# the per-token hash is text.token_hashes — ONE implementation so the
# SimHash family can never drift from the shingle family pipeline.py
# builds from the same pass (a seed/cast change in a local copy would
# silently desynchronize them; CLAUDE.md's xxhash64 int-vs-long gotcha
# is exactly such a change)
from .text import token_hashes  # noqa: E402  (re-export, shared impl)


def with_simhash(df, cfg: DedupeConfig | None = None, tokens_col: str = "tokens"):
    """cfg is accepted for call-site symmetry with the other feature
    builders but unused: the 64-bit width is fixed by the packing
    (simhash_bits only partitions chunks downstream)."""
    return df.withColumn(
        "simhash", make_simhash_udf()(token_hashes(F.col(tokens_col)))
    )


def hamming64(col_a, col_b):
    """JVM-side hamming distance: bit_count(a XOR b)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))
