"""SimHash UDF parity + hamming ladder around the near-exact cutoff."""

from pyspark.sql import functions as F

from lieu_spark import oracle
from lieu_spark.config import DedupeConfig
from lieu_spark.functions.simhash import with_simhash
from lieu_spark.functions.text import tokenize
from lieu_spark.operators.simhash_path import simhash_candidate_pairs

CFG = DedupeConfig()


def _sim_df(spark, texts):
    df = spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)], ["conv_id", "doc"]
    )
    df = df.withColumn("tokens", tokenize(F.col("doc")))
    return with_simhash(df, CFG)


def test_simhash_parity(spark):
    texts = [
        "",
        "one two three one two",
        " ".join(f"w{i}" for i in range(300)),
        "repeat repeat repeat repeat distinct",
    ]
    got = {r.conv_id: r.simhash for r in _sim_df(spark, texts).collect()}
    for i, t in enumerate(texts):
        assert got[f"d{i:03d}"] == oracle.simhash(oracle.tokens(t), CFG)


def test_hamming_ladder():
    a = oracle.simhash(oracle.tokens("the quick brown fox jumps over the lazy dog"), CFG)
    assert oracle.hamming64(a, a) == 0
    flipped = a ^ 0b111  # flip 3 bits
    assert oracle.hamming64(a, flipped) == 3


def test_chunk_keys_pigeonhole():
    a = oracle.simhash(oracle.tokens("alpha beta gamma delta"), CFG)
    b = a ^ (1 << 5) ^ (1 << 20) ^ (1 << 40)  # hamming 3, chunks=4
    ka = dict(oracle.simhash_chunk_keys(a, CFG))
    kb = dict(oracle.simhash_chunk_keys(b, CFG))
    assert any(ka[i] == kb[i] for i in range(CFG.simhash_chunks))


def test_simhash_candidates_handcrafted(spark):
    """Join + hamming logic on handcrafted hashes: <=3 bit flips pair,
    distant hashes don't."""
    a = oracle.simhash(oracle.tokens("alpha beta gamma delta epsilon"), CFG)
    near = a ^ (1 << 2) ^ (1 << 33) ^ (1 << 60)  # hamming 3
    far = ~a & ((1 << 64) - 1)  # hamming 64
    import numpy as np

    to_signed = lambda u: int(np.uint64(u).astype(np.int64))
    feat = spark.createDataFrame(
        [("d000", to_signed(a)), ("d001", to_signed(near)), ("d002", to_signed(far))],
        "conv_id string, simhash long",
    )
    pairs = simhash_candidate_pairs(feat, CFG).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get(("d000", "d001")) == 3
    assert all("d002" not in p for p in got)


def test_simhash_candidates_token_reorder(spark):
    """Same token multiset in different order => identical simhash =>
    near-exact pair (text path end-to-end)."""
    words = [f"tok{i:03d}" for i in range(80)]
    base = " ".join(words)
    reordered = " ".join(reversed(words))
    other = " ".join(f"zz{i}" for i in range(80))
    feat = _sim_df(spark, [base, reordered, other]).select("conv_id", "simhash")
    pairs = simhash_candidate_pairs(feat, CFG).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get(("d000", "d001")) == 0
    assert all("d002" not in p for p in got)


def test_config_rejects_hamming_max_at_or_above_chunks():
    # pigeonhole blocking only guarantees a chunk collision for
    # hamming <= chunks-1; accepting hamming_max == chunks silently
    # loses pairs the filter claims to accept
    import pytest

    from lieu_spark.config import DedupeConfig

    with pytest.raises(ValueError, match="pigeonhole"):
        DedupeConfig(simhash_hamming_max=4, simhash_chunks=4)
    DedupeConfig(simhash_hamming_max=3, simhash_chunks=4)  # default ok
