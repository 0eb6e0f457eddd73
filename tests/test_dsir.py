"""DSIR importance resampling (functions/weighting.dsir_logweights).

Checks: a pure-python replay of the full chain (hashed features,
Laplace-smoothed target/raw bucket models, integer-scaled deltas)
matches the Spark output exactly; target-like raw docs outscore
garbage; zero-token docs stay visible; top-k selection is stable.
"""

import hashlib
import math

from pyspark.sql import functions as F

from lieu_spark.functions.weighting import DSIR_BUCKETS, dsir_logweights

DOCS = [
    # target slice: ids 0 and 5 (id % 5 == 0), clean english-ish prose
    (0, "the quick brown fox jumps over the lazy dog"),
    (5, "the quick red fox runs over the green field"),
    # raw: target-like (shares tokens AND bigrams with the target)
    (1, "the quick brown fox sleeps"),
    # raw: garbage (no overlap with anything)
    (2, "zxq vvw qqj kkp zxq"),
    # raw: empty after canonicalization
    (3, "!!! ???"),
    # raw: single token (unigram feature only, no bigrams)
    (4, "fox"),
]


def _tokenize(text):
    import re

    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def _bucket(ng, m=DSIR_BUCKETS):
    h = hashlib.md5(("dsir" + ng).encode()).hexdigest()
    return int(h[:15], 16) % m


def _python_replay(rows, m=DSIR_BUCKETS):
    feats = {}
    for doc_id, text in rows:
        toks = _tokenize(text)
        ngs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats[doc_id] = [_bucket(ng, m) for ng in ngs]
    ct, cr = {}, {}
    for doc_id, bs in feats.items():
        side = ct if doc_id % 5 == 0 else cr
        for b in bs:
            side[b] = side.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    buckets = set(ct) | set(cr)
    delta6 = {
        b: round(
            (
                math.log((ct.get(b, 0) + 1.0) / (nt + m))
                - math.log((cr.get(b, 0) + 1.0) / (nr + m))
            )
            * 1e6
        )
        for b in buckets
    }
    out = {}
    for doc_id, bs in feats.items():
        out[doc_id] = (len(bs), sum(delta6[b] for b in bs))
    return out


def _score(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = dsir_logweights(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    return {r.doc_id: r for r in res.collect()}


def test_dsir_matches_python_replay(spark):
    got = _score(spark, DOCS)
    want = _python_replay(DOCS)
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, (n_feats, logw6) in want.items():
        assert got[doc_id].n_feats == n_feats, doc_id
        assert got[doc_id].logw6 == logw6, doc_id


def test_dsir_target_like_beats_garbage(spark):
    got = _score(spark, DOCS)
    # doc 1 shares unigrams+bigrams with the target model; doc 2 shares
    # nothing — the whole point of the importance weight.
    assert got[1].logw6 > got[2].logw6
    assert got[1].is_target == 0 and got[0].is_target == 1


def test_dsir_zero_token_doc_visible(spark):
    got = _score(spark, DOCS)
    assert got[3].n_feats == 0 and got[3].logw6 == 0


def test_dsir_topk_selection_stable(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    scored = dsir_logweights(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    raw = scored.filter(F.col("is_target") == 0)
    top2 = [
        r.doc_id
        for r in raw.orderBy(F.desc("logw6"), "doc_id").limit(2).collect()
    ]
    # deterministic, and the target-like doc is selected first
    assert top2[0] == 1 and len(top2) == 2
