"""TF-IDF + information-gain word index vs the pure-python oracle
(lieu A8/A9 parity, lib/lieu/tfidf.py:85-98,
lib/lieu/information_gain.py:74-102)."""

import pytest

from lieu_spark import oracle
from lieu_spark.functions.weighting import information_gain, tfidf_scores

DOCS = {
    1: ["spark", "dedupe", "spark", "fast"],
    2: ["dedupe", "slow", "join"],
    3: ["spark", "join", "join", "agg"],
    4: ["lonely"],
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in DOCS.items()], "doc_id long, tokens array<string>"
    )


def test_tfidf_matches_oracle(spark, docs_df):
    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.score, r.score_norm)
        for r in tfidf_scores(docs_df).collect()
    }
    want = oracle.tfidf_scores(DOCS)
    assert set(got) == {(d, t) for d, toks in want.items() for t in toks}
    for (d, t), (tf, df, s, sn) in got.items():
        wtf, wdf, ws, wsn = want[d][t]
        assert (tf, df) == (wtf, wdf)
        assert abs(s - ws) < 1e-12
        assert abs(sn - wsn) < 1e-12


def test_tfidf_l2_norm_is_unit(spark, docs_df):
    rows = tfidf_scores(docs_df).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, 0.0)
        by_doc[r.doc_id] += r.score_norm**2
    for doc_id, sq in by_doc.items():
        # unit norm unless the doc's scores were all zero
        assert abs(sq - 1.0) < 1e-9 or all(
            abs(r.score) < 1e-12 for r in rows if r.doc_id == doc_id
        )


def test_information_gain_matches_oracle(spark, docs_df):
    got = {r.token: r.ig for r in information_gain(docs_df).collect()}
    want = oracle.information_gain(DOCS)
    assert set(got) == set(want)
    for tok, ig in got.items():
        assert abs(ig - want[tok]) < 1e-9, tok
    # the never-co-occurring token gets -log2(p)
    assert got["lonely"] == pytest.approx(want["lonely"])
    assert got["lonely"] > 0


def test_weighted_jaccard_ranks_rare_overlap_above_boilerplate(spark):
    """The soft-TFIDF intent: two docs sharing a RARE token pair must
    outscore two docs sharing only corpus-wide boilerplate, even when
    the unweighted Jaccard of both pairs is identical."""
    from lieu_spark.functions.weighting import idf_weights, weighted_jaccard_for_pairs

    corpus_docs = {
        1: ["the", "a", "zebra", "quagga"],
        2: ["the", "a", "zebra", "quagga"],
        3: ["the", "a", "x3", "y3"],
        4: ["the", "a", "x4", "y4"],
    }
    for i in range(5, 25):  # boilerplate 'the'/'a' everywhere -> w6 ~ 0
        corpus_docs[i] = ["the", "a", f"u{i}", f"v{i}"]
    docs_df = spark.createDataFrame(
        [(k, v) for k, v in corpus_docs.items()], "doc_id long, tokens array<string>"
    )
    w = idf_weights(docs_df)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): (r.wj6, r.w_inter)
        for r in weighted_jaccard_for_pairs(pairs, docs_df, w).collect()
    }
    assert got[(1, 2)][0] == 1_000_000  # identical docs
    # unweighted J(3,4) = 2/6; weighted must be far lower (only
    # boilerplate shared)
    assert got[(3, 4)][0] < 150_000, got

    # pure-python recomputation of pair (3,4)
    import math

    n = len(corpus_docs)
    dfreq: dict = {}
    for toks in corpus_docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    w6 = {t: round(math.log(n / d) * 1e6) for t, d in dfreq.items()}
    a, b = set(corpus_docs[3]), set(corpus_docs[4])
    wi = sum(w6[t] for t in a & b)
    wu = sum(w6[t] for t in a | b)
    assert got[(3, 4)] == (round(wi / wu * 1e6), wi)


def test_bucket_aliases_semantics(spark):
    """Sparse (lang, source) cells alias to the densest same-lang cell
    clearing min_docs (ties: source ASC); dense cells and sparse cells
    with no dense sibling keep themselves (geo_word_index.py:18-26
    analog)."""
    from lieu_spark.functions.weighting import bucket_aliases

    rows = (
        [("en", "s1")] * 6      # dense
        + [("en", "s2")] * 6    # dense (tie with s1 -> target is s1)
        + [("en", "s3")] * 2    # sparse -> aliases to en/s1
        + [("fr", "s1")] * 2    # sparse, no dense fr sibling -> keeps self
        + [("fr", "s2")] * 1    # sparse, keeps self
    )
    docs = spark.createDataFrame(
        [(i, l, s) for i, (l, s) in enumerate(rows)], ["doc_id", "lang", "source"]
    )
    got = {
        (r.lang, r.source): r.eff_source
        for r in bucket_aliases(docs, min_docs=5).collect()
    }
    assert got == {
        ("en", "s1"): "s1",
        ("en", "s2"): "s2",
        ("en", "s3"): "s1",
        ("fr", "s1"): "s1",
        ("fr", "s2"): "s2",
    }


def test_information_gain_reference_hand_values(spark):
    # reference formula (lib/lieu/information_gain.py:47-102):
    # docs {a,b},{a,b},{a,c},{c} -> p(a)=3/4, p(b)=1/2, p(c)=1/2
    # ig(b) = 1 * log2(1 / (3/4)) = log2(4/3) (only context is a)
    # ig(a) = (2/3)log2((2/3)/(1/2)) + (1/3)log2((1/3)/(1/2))
    import math

    from lieu_spark.functions.weighting import information_gain

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["a", "c"]), (4, ["c"])],
        "doc_id long, tokens array<string>",
    )
    got = {r.token: r.ig for r in information_gain(df).collect()}
    assert abs(got["b"] - math.log2(4 / 3)) < 1e-12
    want_a = (2 / 3) * math.log2((2 / 3) / 0.5) + (1 / 3) * math.log2(
        (1 / 3) / 0.5
    )
    assert abs(got["a"] - max(0.0, want_a)) < 1e-12
    assert abs(got["c"] - math.log2(4 / 3)) < 1e-12


def test_weighted_jaccard_keeps_pair_spine(spark):
    # a pair whose one side has NO weighted tokens (empty text) must
    # emit wj6=0, not silently vanish from the output
    from lieu_spark.functions.weighting import (
        idf_weights,
        weighted_jaccard_for_pairs,
    )

    toks = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["x", "z"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    weights = idf_weights(toks)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 2)], "id_a long, id_b long"
    )
    rows = {(r.id_a, r.id_b): r for r in
            weighted_jaccard_for_pairs(pairs, toks, weights).collect()}
    assert set(rows) == {(1, 2), (1, 3), (3, 2)}
    assert rows[(1, 3)].wj6 == 0 and rows[(3, 2)].wj6 == 0
    assert rows[(1, 2)].wj6 > 0
