"""MinHash signatures via one-permutation hashing (OPH), Arrow-batched.

Replaces the reference's C ``near_dupe_hashes`` blocking-key generator
(/root/reference/lib/lieu/dedupe.py:250-325) with MinHash + LSH banding.

Classic k-permutation MinHash costs O(n_shingles * num_perm) uint64
traffic per doc — memory-bandwidth-bound and the pipeline's dominant
cost at scale. One-permutation hashing (Li, Owen, Zhang 2012) gets the
same signature family in O(n_shingles): partition the 64-bit hash space
into ``num_perm`` bins by the top bits, keep the min hash per bin, and
densify empty bins by rotation borrowing (Shrivastava & Li 2014) with a
per-step offset to avoid spurious collisions between sparse docs.

The whole batch is one ``np.minimum.at`` scatter-min — no per-row
Python, ~128x less memory traffic than the permutation matrix.

sig semantics (shared bit-for-bit with lieu_spark.oracle.minhash_signature):
  bucket(x)  = unsigned(x) >> (64 - log2(num_perm))
  sig[j]     = min unsigned(x) over shingles with bucket(x) == j
  empty bin  -> borrow sig[(j+d) % B] of the nearest non-empty bin
                (smallest d >= 1), value + d * GOLD  (mod 2**64)
  empty doc  -> all MASK64 sentinel
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import MASK64, DedupeConfig

GOLD = np.uint64(0x9E3779B97F4A7C15)  # odd constant for densification offsets
_EMPTY = np.uint64(MASK64)


def densify(sig: np.ndarray) -> np.ndarray:
    """Rotation densification, vectorized over (rows, B). Rows with no
    occupied bin at all are left as the all-sentinel signature."""
    B = sig.shape[1]
    occupied = sig != _EMPTY
    any_occ = occupied.any(axis=1)
    out = sig.copy()
    need = ~occupied & any_occ[:, None]
    d = 1
    while need.any() and d < B:
        src = np.roll(sig, -d, axis=1)  # bin j takes from bin (j+d) % B
        src_occ = np.roll(occupied, -d, axis=1)
        take = need & src_occ
        with np.errstate(over="ignore"):
            out[take] = src[take] + np.uint64(d) * GOLD
        need &= ~take
        d += 1
    return out


def oph_batch(arrays: pd.Series, num_perm: int) -> pd.Series:
    n = len(arrays)
    B = num_perm
    shift = np.uint64(64 - int(B).bit_length() + 1)  # 64 - log2(B)
    # None (a NULL array column) is the documented "no hashes" encoding
    # alongside []; len(None) would TypeError and kill the stage
    lens = np.fromiter(
        (0 if v is None else len(v) for v in arrays), dtype=np.int64, count=n
    )
    out = np.full((n, B), _EMPTY, dtype=np.uint64)
    nz = np.nonzero(lens > 0)[0]
    if nz.size:
        flat = np.concatenate(
            [np.asarray(arrays.iat[i], dtype=np.int64) for i in nz]
        ).view(np.uint64)
        rows = np.repeat(np.arange(nz.size), lens[nz])
        keys = rows * B + (flat >> shift).astype(np.int64)
        mins = np.full(nz.size * B, _EMPTY, dtype=np.uint64)
        np.minimum.at(mins, keys, flat)
        out[nz] = densify(mins.reshape(nz.size, B))
    return pd.Series(list(out.view(np.int64)))


def make_minhash_udf(cfg: DedupeConfig):
    """pandas UDF: array<long> shingle hashes -> array<long> signature."""
    num_perm = cfg.num_perm

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        return oph_batch(hashes, num_perm)

    return minhash_udf


def make_minhash_pair_udf(cfg: DedupeConfig):
    """pandas UDF: (primary hashes, alt hashes) -> struct(sig, alt_sig)
    in ONE Arrow pass. Spark's UDF extraction evaluates a python UDF
    unconditionally even under a CASE guard, so a separate alt-sig UDF
    would cost a second full-column round trip per feature build; fusing
    the two means the (virtually always empty) alt arrays ride along in
    the same batch for near-zero marginal bytes, and alt_sig is computed
    only for the rows that actually carry an alt family (null
    otherwise)."""
    from pyspark.sql.types import StructField, StructType

    num_perm = cfg.num_perm
    schema = StructType(
        [
            StructField("sig", ArrayType(LongType())),
            StructField("alt_sig", ArrayType(LongType())),
        ]
    )

    @F.pandas_udf(schema)
    def minhash_pair_udf(hashes: pd.Series, alt: pd.Series) -> pd.DataFrame:
        sig = oph_batch(hashes, num_perm)
        n = len(alt)
        alt_out: list = [None] * n
        # None-safe: a NULL alt array is the natural "no alt family"
        # encoding (the docstring's own contract) — len(None) raised
        nz = [
            i
            for i in range(n)
            if alt.iat[i] is not None and len(alt.iat[i])
        ]
        if nz:
            alt_sigs = oph_batch(
                pd.Series([alt.iat[i] for i in nz]), num_perm
            )
            for j, i in enumerate(nz):
                alt_out[i] = alt_sigs.iat[j]
        return pd.DataFrame({"sig": sig, "alt_sig": alt_out})

    return minhash_pair_udf


def with_minhash(df, cfg: DedupeConfig, hashes_col: str = "shingle_hashes"):
    return df.withColumn("sig", make_minhash_udf(cfg)(F.col(hashes_col)))


def with_minhash_dual(
    df,
    cfg: DedupeConfig,
    hashes_col: str = "shingle_hashes",
    alt_col: str = "alt_hashes",
):
    """Attach sig AND alt_sig from one fused Arrow pass (see
    make_minhash_pair_udf); alt_sig is null for rows with no alt
    family — identical values to two with_minhash calls."""
    pair = make_minhash_pair_udf(cfg)(F.col(hashes_col), F.col(alt_col))
    return (
        df.withColumn("_mh", pair)
        .withColumn("sig", F.col("_mh.sig"))
        .withColumn("alt_sig", F.col("_mh.alt_sig"))
        .drop("_mh")
    )
