"""Suffix-array LCS: numpy Spark-path implementation vs the independent
pure-python oracle, plus adversarial strings and the winnowing blocker."""

import numpy as np

from lieu_spark import oracle
from lieu_spark.config import DedupeConfig
from lieu_spark.operators.spans import lcs_pair, winnow_span_candidates

CFG = DedupeConfig()


def test_known_lcs():
    a = "the quick brown fox jumps over the lazy dog"
    b = "xx quick brown fox jumps zz"
    sa, sb, ln = lcs_pair(a, b, 10000)
    assert a[sa : sa + ln] == b[sb : sb + ln]
    assert a[sa : sa + ln] == " quick brown fox jumps "


def test_matches_oracle_random():
    rng = np.random.default_rng(3)
    alpha = "abcdef "
    for _ in range(20):
        a = "".join(rng.choice(list(alpha), size=int(rng.integers(5, 200))))
        b = "".join(rng.choice(list(alpha), size=int(rng.integers(5, 200))))
        got = lcs_pair(a, b, 10000)
        want = oracle.longest_common_substring(a, b)
        assert got[2] == want[2], (a, b, got, want)
        assert a[got[0] : got[0] + got[2]] == b[got[1] : got[1] + got[2]]


def test_adversarial_repeats():
    a = "a" * 500
    b = "a" * 300
    sa, sb, ln = lcs_pair(a, b, 10000)
    assert ln == 300
    assert a[sa : sa + ln] == b[sb : sb + ln]
    got = lcs_pair("ababab" * 50, "bababa" * 50, 10000)
    want = oracle.longest_common_substring("ababab" * 50, "bababa" * 50)
    assert got[2] == want[2]


def test_empty_and_disjoint():
    assert lcs_pair("", "abc", 100) == (0, 0, 0)
    assert lcs_pair("abc", "", 100) == (0, 0, 0)
    assert lcs_pair("aaa", "bbb", 100)[2] == 0


def test_cap_respected():
    a = "x" * 100 + "needle" * 10
    b = "y" * 100 + "needle" * 10
    # cap cuts off the needles
    assert lcs_pair(a, b, 100)[2] == 0


def test_winnow_blocker_finds_span_pair(spark):
    from pyspark.sql import functions as F

    from lieu_spark.functions.text import shingle_hash_set, token_hashes, tokenize

    span = " ".join(f"sp{i:03d}" for i in range(120))
    a = " ".join(f"aa{i}" for i in range(200)) + " " + span
    b = span + " " + " ".join(f"bb{i}" for i in range(200))
    c = " ".join(f"cc{i}" for i in range(200))
    df = spark.createDataFrame(
        [("A", a), ("B", b), ("C", c)], ["conv_id", "doc"]
    ).withColumn("tokens", tokenize(F.col("doc")))
    df = df.withColumn(
        "shingle_hashes", shingle_hash_set(token_hashes(F.col("tokens")), CFG.shingle_k)
    )
    got = {(r.id_a, r.id_b) for r in winnow_span_candidates(df, CFG).collect()}
    assert ("A", "B") in got
    assert all("C" not in p for p in got)


def test_remove_copied_spans_merging_and_cutting(spark):
    """Exact-substring removal: overlapping/adjacent/nested cuts merge
    into disjoint runs before a single-pass fold; the canonical (id_a)
    side is untouched; docs with no spans pass through with n_cut=0."""
    from lieu_spark.operators.spans import remove_copied_spans

    docs = spark.createDataFrame(
        [("a", "0123456789"), ("b", "abcdefghij"), ("c", "untouched")],
        ["conv_id", "doc"],
    )
    spans = spark.createDataFrame(
        [
            ("x", "a", 0, 2, 3),  # [2,5)
            ("x", "a", 0, 4, 2),  # [4,6) overlaps -> [2,6)
            ("x", "a", 0, 6, 1),  # [6,7) adjacent -> [2,7)
            ("y", "b", 0, 0, 4),  # head cut
            ("y", "b", 0, 8, 2),  # tail cut to end
        ],
        ["id_a", "id_b", "start_a", "start_b", "length"],
    )
    out = {
        r["conv_id"]: (r["n_cut"], r["doc_scrubbed"])
        for r in remove_copied_spans(docs, spans).collect()
    }
    assert out["a"] == (1, "01789")
    assert out["b"] == (2, "efgh")
    assert out["c"] == (0, "untouched")
    # whole-doc cut leaves the empty string, not NULL
    total = spark.createDataFrame([("z", "a", 0, 0, 10)], spans.columns)
    rows = remove_copied_spans(docs, total).collect()
    assert {r["conv_id"]: r["doc_scrubbed"] for r in rows}["a"] == ""
    # scrubbed output never contains a reported span's text
    span_text = "23456"
    assert span_text in "0123456789" and span_text not in out["a"]
