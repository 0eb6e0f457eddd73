"""SimHash near-exact candidate path.

Second blocking family alongside MinHash/LSH — the analog of the
reference's dual-key emission where one record emits blocking keys under
two normalizations (house_number_base, lib/lieu/dedupe.py:276-325): every
conversation emits both its LSH band keys and its SimHash chunk keys.

Pigeonhole blocking: the 64-bit simhash splits into ``simhash_chunks``
equal-width chunks; any two hashes within hamming distance
``simhash_chunks - 1`` collide on >= 1 chunk. Candidates are confirmed
JVM-side with ``bit_count(a XOR b) <= simhash_hamming_max``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupeConfig
from ..functions.simhash import hamming64


def simhash_chunk_table(features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id") -> DataFrame:
    """(id, simhash) -> (id, chunk, chunk_bits)."""
    width = cfg.simhash_bits // cfg.simhash_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_bits"),
            )
            for i in range(cfg.simhash_chunks)
        ]
    )
    return features.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("ck")
    ).select("id", F.col("ck.chunk").alias("chunk"), F.col("ck.chunk_bits").alias("chunk_bits"))


def simhash_chunk_stats(features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id") -> DataFrame:
    """Per-chunk-group metrics (size + hot flag) — the SimHash analog of
    lsh.band_stats. When ``simhash_hot_chunk_cap`` is set, rows with
    is_hot=True mark the groups whose pigeonhole guarantee degraded to
    probabilistic (split groups can lose a pair whose only collision was
    this chunk)."""
    cap = cfg.simhash_hot_chunk_cap if cfg.simhash_hot_chunk_cap is not None else (1 << 62)
    return (
        simhash_chunk_table(features, cfg, id_col)
        .groupBy("chunk", "chunk_bits")
        .agg(F.count("*").alias("bsize"))
        .withColumn("is_hot", F.col("bsize") > cap)
    )


def simhash_candidate_pairs(features: DataFrame, cfg: DedupeConfig, id_col: str = "conv_id") -> DataFrame:
    """Chunk-collision self-join filtered by exact hamming distance.

    Returns (id_a, id_b, hamming) with id_a < id_b, distinct.
    """
    from .lsh import salted_groups

    # Hot-chunk salting is OPT-IN here (cfg.simhash_hot_chunk_cap,
    # default None = never split), unlike the LSH band path where it is
    # always on: the pigeonhole guarantee is >=1 colliding chunk for
    # hamming<=chunks-1, and "exactly 1" is realizable — splitting that
    # single group loses the pair with no other chunk to recover it.
    # With a cap set, the guarantee becomes probabilistic for split
    # groups; the hot groups are surfaced in simhash_chunk_stats.
    cap = (
        cfg.simhash_hot_chunk_cap
        if cfg.simhash_hot_chunk_cap is not None
        else (1 << 62)  # effectively "never split"; keeps one plan shape
    )
    tbl = salted_groups(
        simhash_chunk_table(features, cfg, id_col),
        ["chunk", "chunk_bits"],
        cap,
    ).filter(F.col("bsize") > 1).select("chunk", "chunk_bits", "sub", "id")
    left = tbl.select("chunk", "chunk_bits", "sub", F.col("id").alias("id_a"))
    right = tbl.select("chunk", "chunk_bits", "sub", F.col("id").alias("id_b"))
    cand = (
        left.join(right, ["chunk", "chunk_bits", "sub"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = features.select(F.col(id_col), F.col("simhash"))
    fa = sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("simhash_a"))
    fb = sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("simhash_b"))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming64(F.col("simhash_a"), F.col("simhash_b")))
        .filter(F.col("hamming") <= cfg.simhash_hamming_max)
        .select("id_a", "id_b", "hamming")
    )
