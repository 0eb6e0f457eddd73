"""Hand-computed cases for C4-style line dedup (operators/linededup.py)
plus the normalize-then-exact-hash tier (text.normalize_template) and
the Gopher rule filter (analysis.gopher_rules)."""

import hashlib

from pyspark.sql import functions as F

from lieu_spark.functions.analysis import gopher_rules
from lieu_spark.functions.text import normalize_template
from lieu_spark.operators.linededup import dedupe_lines, explode_lines


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_dedupe_lines_first_occurrence_kept(spark):
    # doc 1: [u1, shared, u2]; doc 2: [shared, u3]; doc 3: [shared]
    # first occurrence of "shared" is (doc 1, idx 1) — docs 2 and 3 lose
    # it; doc 3 loses everything and must still appear with n_kept=0.
    docs = spark.createDataFrame(
        [
            (1, ["u1", "shared", "u2"]),
            (2, ["shared", "u3"]),
            (3, ["shared"]),
        ],
        "doc_id long, lines array<string>",
    )
    out = {
        r["doc_id"]: r
        for r in dedupe_lines(explode_lines(docs)).collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["kept_sha"] == _sha("u1\nshared\nu2")
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_sha"] == _sha("u3")
    assert out[3]["n_lines"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["kept_sha"] == _sha("")


def test_dedupe_lines_within_doc_repeat(spark):
    # a line repeated INSIDE one doc keeps only its first position
    docs = spark.createDataFrame(
        [(7, ["x", "x", "y"])], "doc_id long, lines array<string>"
    )
    row = dedupe_lines(explode_lines(docs)).collect()[0]
    assert row["n_lines"] == 3 and row["n_kept"] == 2
    assert row["kept_sha"] == _sha("x\ny")


def test_dedupe_lines_blank_lines_exempt(spark):
    # blank (trim-empty) lines are paragraph structure, not boilerplate:
    # every occurrence survives, including repeats inside one doc and
    # across docs — only the non-blank "shared" line dedupes.
    docs = spark.createDataFrame(
        [
            (1, ["p1", "", "shared", "  ", "p2"]),
            (2, ["q1", "", "shared", "q2"]),
        ],
        "doc_id long, lines array<string>",
    )
    out = {
        r["doc_id"]: r
        for r in dedupe_lines(explode_lines(docs)).collect()
    }
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 5
    assert out[1]["kept_sha"] == _sha("p1\n\nshared\n  \np2")
    assert out[2]["n_lines"] == 4 and out[2]["n_kept"] == 3
    assert out[2]["kept_sha"] == _sha("q1\n\nq2")


def test_normalize_template_collapses_digits_case_ws(spark):
    df = spark.createDataFrame(
        [("Run 42:  alpha  beta 7x",), ("run : alpha beta x",)],
        "text string",
    )
    vals = [r[0] for r in df.select(normalize_template(F.col("text"))).collect()]
    assert vals[0] == vals[1] == "run : alpha beta x"


def test_gopher_rules_flags(spark):
    long_ok = "the a of " + " ".join(f"word{'x' * (i % 3)}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, long_ok),               # passes everything
            (2, "short doc only"),      # fails r_len and r_stop
            (3, "9999 " * 60),          # digits: fails r_alpha and r_stop
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out[1]["keep"] == 1 and out[1]["r_len"] == 1 and out[1]["r_stop"] == 1
    assert out[2]["r_len"] == 0 and out[2]["r_stop"] == 0 and out[2]["keep"] == 0
    assert out[3]["r_alpha"] == 0 and out[3]["keep"] == 0
    # digit tokens: '9999' repeated -> alpha ratio 0, mean len 4 in-band
    assert out[3]["alpha_word_ratio6"] == 0
    assert out[3]["mean_token_len6"] == 4000000


def test_dedupe_lines_idempotent_and_conserving(spark):
    """Invariants: n_kept <= n_lines per doc; total kept == number of
    distinct lines in the corpus; and the operator is idempotent — the
    kept occurrence set is already line-unique, so re-running keeps
    everything."""
    from lieu_spark.operators.linededup import kept_lines

    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "c"]),
            (2, ["b", "d", "d"]),
            (3, ["c", "e"]),
        ],
        "doc_id long, lines array<string>",
    )
    lined = explode_lines(docs)
    stats = dedupe_lines(lined).collect()
    assert all(r["n_kept"] <= r["n_lines"] for r in stats)
    n_distinct = lined.select("line").distinct().count()
    assert sum(r["n_kept"] for r in stats) == n_distinct

    kept = kept_lines(lined)
    again = dedupe_lines(kept)
    assert all(r["n_kept"] == r["n_lines"] for r in again.collect())
