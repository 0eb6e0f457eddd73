"""MinHash signature + LSH band parity and analytic sanity."""

import numpy as np
from pyspark.sql import functions as F

from lieu_spark import oracle
from lieu_spark.config import DedupeConfig
from lieu_spark.functions.minhash import with_minhash
from lieu_spark.functions.text import shingle_hash_set, token_hashes, tokenize
from lieu_spark.operators.lsh import band_table

CFG = DedupeConfig()


def _feature_df(spark, texts):
    df = spark.createDataFrame([(f"d{i:03d}", t) for i, t in enumerate(texts)], ["conv_id", "doc"])
    df = df.withColumn("tokens", tokenize(F.col("doc")))
    df = df.withColumn(
        "shingle_hashes", shingle_hash_set(token_hashes(F.col("tokens")), CFG.shingle_k)
    )
    return with_minhash(df, CFG)


def test_signature_parity(spark):
    texts = [
        "",
        "one two three",
        " ".join(f"w{i}" for i in range(100)),
        " ".join(f"w{i % 7}" for i in range(50)),
        "solo",
    ]
    feat = _feature_df(spark, texts).select("conv_id", "sig").collect()
    got = {r.conv_id: r.sig for r in feat}
    for i, t in enumerate(texts):
        want = oracle.minhash_signature(oracle.shingle_hashes(t, CFG.shingle_k), CFG)
        assert got[f"d{i:03d}"] == want, f"sig mismatch for text {i}"


def test_band_key_parity(spark):
    texts = [" ".join(f"w{i}" for i in range(60)), "alpha beta gamma delta epsilon zeta"]
    feat = _feature_df(spark, texts)
    bands = band_table(feat, CFG).collect()
    got = {}
    for r in bands:
        got.setdefault(r.id, []).append((r.band, r.band_hash))
    for i, t in enumerate(texts):
        sig = oracle.minhash_signature(oracle.shingle_hashes(t, CFG.shingle_k), CFG)
        want = oracle.band_keys(sig, CFG)
        assert sorted(got[f"d{i:03d}"]) == sorted(want)


def test_minhash_estimates_jaccard():
    """Signature agreement ~ Jaccard within statistical tolerance."""
    rng = np.random.default_rng(7)
    # full-range 64-bit values — OPH buckets by top bits, and real
    # xxhash64 output spans the whole space
    base = [int(x) for x in rng.integers(0, 2**64, 400, dtype=np.uint64).astype(np.int64)]
    half = base[:200] + [
        int(x) for x in rng.integers(0, 2**64, 200, dtype=np.uint64).astype(np.int64)
    ]
    sa = oracle.minhash_signature(base, CFG)
    sb = oracle.minhash_signature(half, CFG)
    true_j = oracle.jaccard(set(base), set(half))
    est = oracle.signature_agreement(sa, sb)
    assert abs(est - true_j) < 0.15  # 128 perms => se ~ 0.044


def test_identical_sets_identical_signatures():
    h = [1, 5, 9, 123456789]
    assert oracle.minhash_signature(h, CFG) == oracle.minhash_signature(list(reversed(h)), CFG)


def test_empty_signature_sentinel():
    sig = oracle.minhash_signature([], CFG)
    assert len(sig) == CFG.num_perm and all(s == -1 for s in sig)  # MASK64 as signed


def test_fused_dual_minhash_equals_two_passes(spark):
    """with_minhash_dual must be value-identical to two independent
    with_minhash calls: same sig for every row, alt_sig = minhash of
    alt_hashes where non-empty, null where empty (the fused Arrow pass
    is a performance shape, never a semantics change)."""
    from pyspark.sql import functions as F

    from lieu_spark.config import DedupeConfig
    from lieu_spark.functions.minhash import with_minhash, with_minhash_dual

    cfg = DedupeConfig()
    rows = [
        (f"d{i}",
         [j * 7919 + i for j in range(i % 5 * 10)],          # primary
         [j * 104729 + i for j in range(20)] if i % 3 == 0 else [])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, shingle_hashes array<long>, alt_hashes array<long>"
    )
    fused = {
        r.conv_id: (tuple(r.sig), tuple(r.alt_sig) if r.alt_sig is not None else None)
        for r in with_minhash_dual(df, cfg).collect()
    }
    prim = {r.conv_id: tuple(r.sig) for r in with_minhash(df, cfg).collect()}
    alt = {
        r.conv_id: tuple(r.sig)
        for r in with_minhash(
            df.filter(F.size("alt_hashes") > 0), cfg, hashes_col="alt_hashes"
        ).collect()
    }
    for cid, (sig, alt_sig) in fused.items():
        assert sig == prim[cid], cid
        assert alt_sig == alt.get(cid), cid


def test_minhash_dual_null_alt_array(spark):
    # NULL alt array = "no alt family" (the documented contract);
    # len(None) used to TypeError inside the fused Arrow pass
    from lieu_spark.functions.minhash import with_minhash_dual

    df = spark.createDataFrame(
        [(1, [11, 22, 33], None), (2, [11, 22, 44], [5, 6])],
        "doc_id long, shingle_hashes array<long>, alt_hashes array<long>",
    )
    out = {r.doc_id: r for r in with_minhash_dual(df, CFG).collect()}
    assert out[1].alt_sig is None
    assert out[2].alt_sig is not None
    assert len(out[1].sig) == CFG.num_perm
