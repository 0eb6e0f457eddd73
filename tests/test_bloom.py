"""Bloom-filter decontamination prefilter (operators/bloom.py):
no-false-negative invariant, empty-member screen, bounded false-positive
behavior, and the zero-shuffle training-side plan shape the operator
exists for.
"""

import pytest
from pyspark.sql import functions as F

from lieu_spark.operators.bloom import bloom_screen, bloom_words

from test_plans import plan_of

M, K = 1 << 12, 4


def _grams(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "g string")


def test_bloom_no_false_negatives(spark):
    members = [f"mem{i}" for i in range(200)]
    mdf = _grams(spark, members)
    bloom = bloom_words(mdf, m=M, k=K)
    out = bloom_screen(mdf, bloom, m=M, k=K).collect()
    assert len(out) == 200
    assert all(r.might_contain for r in out)


def test_bloom_empty_members_screens_everything(spark):
    empty = _grams(spark, []).filter(F.lit(False))
    bloom = bloom_words(empty, m=M, k=K)
    probes = _grams(spark, [f"x{i}" for i in range(50)])
    out = bloom_screen(probes, bloom, m=M, k=K).collect()
    assert len(out) == 50
    assert not any(r.might_contain for r in out)


def test_bloom_false_positives_bounded_and_deterministic(spark):
    """Non-members mostly screen out at the design load (n << m/k), and
    the verdict column is a pure function of (g, m, k) — two runs agree
    bit for bit (the property the DuckDB oracle depends on)."""
    members = [f"mem{i}" for i in range(200)]
    bloom = bloom_words(_grams(spark, members), m=M, k=K)
    probes = _grams(spark, [f"non{i}" for i in range(500)])
    out1 = {r.g: r.might_contain for r in bloom_screen(probes, bloom, m=M, k=K).collect()}
    out2 = {r.g: r.might_contain for r in bloom_screen(probes, bloom, m=M, k=K).collect()}
    assert out1 == out2
    fp = sum(out1.values())
    # n=200, m=4096, k=4 -> theoretical fp ~ (1-e^{-kn/m})^4 ~ 9e-4;
    # allow a generous margin but require the screen to actually screen
    assert fp <= 25


def test_bloom_words_is_fixed_size(spark):
    """The bitmap relation never exceeds ceil(m/64) rows no matter how
    many member grams fold in — the property that makes the broadcast
    side O(m), independent of eval-corpus size."""
    members = [f"mem{i}" for i in range(3000)]
    words = bloom_words(_grams(spark, members), m=M, k=K).collect()
    assert len(words) <= M // 64
    assert all(0 <= r.word_idx < M // 64 for r in words)


def test_bloom_screen_training_side_never_shuffles(spark):
    """The whole point: probes stream through map-side. The only
    Exchanges in the screen plan belong to the bitmap build (word_idx
    agg + 1-row blob agg) — the gram column itself is never a shuffle
    key, and the bitmap arrives by broadcast."""
    members = _grams(spark, [f"mem{i}" for i in range(10)])
    probes = _grams(spark, [f"p{i}" for i in range(10)])
    bloom = bloom_words(members, m=M, k=K)
    plan = plan_of(bloom_screen(probes, bloom, m=M, k=K))
    assert "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "g#" not in ln, ln
    # screen side must not sort or SMJ — it's a broadcast nest over 1 row
    assert "SortMergeJoin" not in plan


def test_bloom_screen_rejects_mismatched_build_params(spark):
    # probing with different (m, k) than the bitmap was built with
    # silently produces false negatives — the stamped metadata must
    # abort the job instead
    members = _grams(spark, ["alpha", "beta"])
    bloom = bloom_words(members, m=M, k=K)
    ok = bloom_screen(members, bloom, m=M, k=K).collect()
    assert all(r.might_contain for r in ok)
    bad = bloom_screen(members, bloom, m=M, k=K + 1)
    with pytest.raises(Exception, match="does not match the bitmap"):
        bad.collect()


def test_bloom_null_gram_does_not_crash(spark):
    # a NULL gram used to produce a (NULL, NULL) bitmap word and kill
    # bloom_screen with 'map key cannot be null' — nulls are filtered
    # pre-sketch like the KMV family
    mdf = _grams(spark, ["a", "b"]).unionByName(
        spark.createDataFrame([(None,)], "g string")
    )
    bloom = bloom_words(mdf, m=M, k=K)
    probes = _grams(spark, ["a", "zz"])
    out = {r.g: r.might_contain for r in bloom_screen(probes, bloom, m=M, k=K).collect()}
    assert out["a"] is True
