"""MinHash signatures as an Arrow-batched pandas UDF.

Replaces the reference's C ``near_dupe_hashes`` blocking-key generator
(/root/reference/lib/lieu/dedupe.py:250-325) with MinHash + LSH banding.
The UDF is fully numpy-vectorized across the Arrow batch: all shingle
hashes in the batch are flattened into one uint64 array, the (a*x+b) mod
2**64 permutation matrix is evaluated in bounded-memory chunks, and
per-row minima come from ``np.minimum.reduceat`` — no per-row Python.

sig[j] = min over shingle hashes x of (a[j]*x + b[j]) mod 2**64
empty shingle set -> all-MASK64 sentinel signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import MASK64, DedupeConfig

# max shingle hashes per vectorized chunk: 2**16 rows x 128 perms x 8B = 64 MiB
_CHUNK_HASHES = 1 << 16


def _minhash_batch(arrays: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    num_perm = a.shape[0]
    n = len(arrays)
    out = np.empty((n, num_perm), dtype=np.uint64)
    lens = np.fromiter((len(v) for v in arrays), dtype=np.int64, count=n)
    empty_mask = lens == 0
    out[empty_mask, :] = np.uint64(MASK64)

    idx = np.nonzero(~empty_mask)[0]
    if idx.size:
        flat = np.concatenate(
            [np.asarray(arrays.iat[i], dtype=np.int64).view(np.uint64) for i in idx]
        )
        row_lens = lens[idx]
        starts = np.zeros(idx.size, dtype=np.int64)
        np.cumsum(row_lens[:-1], out=starts[1:])
        # chunk on row boundaries so reduceat segments never straddle chunks
        row_ptr = 0
        while row_ptr < idx.size:
            row_end = row_ptr
            total = 0
            while row_end < idx.size and (
                total + row_lens[row_end] <= _CHUNK_HASHES or row_end == row_ptr
            ):
                total += row_lens[row_end]
                row_end += 1
            lo = starts[row_ptr]
            hi = lo + total
            x = flat[lo:hi]
            with np.errstate(over="ignore"):
                vals = x[:, None] * a[None, :] + b[None, :]
            seg_starts = (starts[row_ptr:row_end] - lo).astype(np.intp)
            mins = np.minimum.reduceat(vals, seg_starts, axis=0)
            out[idx[row_ptr:row_end], :] = mins
            row_ptr = row_end

    sig = out.view(np.int64)
    return pd.Series([sig[i] for i in range(n)])


def make_minhash_udf(cfg: DedupeConfig):
    """pandas UDF: array<long> shingle hashes -> array<long> signature."""
    a, b = cfg.minhash_params()

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        return _minhash_batch(hashes, a, b)

    return minhash_udf


def with_minhash(df, cfg: DedupeConfig, hashes_col: str = "shingle_hashes"):
    return df.withColumn("sig", make_minhash_udf(cfg)(F.col(hashes_col)))
