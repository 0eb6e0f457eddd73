"""Canonicalize / tokenize / shingle parity: Spark JVM expressions vs the
pure-python oracle, including unicode and degenerate cases."""

from pyspark.sql import functions as F

from lieu_spark import oracle
from lieu_spark.functions import text as T

CASES = [
    None,
    "",
    "   ",
    "Hello, World!",
    "a",
    "one two three four five six seven",
    "Tabs\tand\nnewlines  and   runs",
    "MIXED case AND punct!!! ok?",
    "café über straße",
    "日本語 テスト 漢字",
    "numbers 123 and 4a5b",
    "x " * 200,
]


def test_canonicalize_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text: string")
    got = [r[0] for r in df.select(T.canonicalize(F.col("text"))).collect()]
    assert got == [oracle.canonicalize(c) for c in CASES]


def test_tokenize_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text: string")
    got = [r[0] for r in df.select(T.tokenize(F.col("text"))).collect()]
    assert got == [oracle.tokens(c) for c in CASES]


def test_shingle_hash_set_parity(spark):
    for k in (2, 5):
        df = spark.createDataFrame([(c,) for c in CASES], "text: string")
        got = [
            r[0]
            for r in df.select(
                T.shingle_hash_set(T.token_hashes(T.tokenize(F.col("text"))), k)
            ).collect()
        ]
        want = [oracle.shingle_hashes(c, k) for c in CASES]
        assert got == want


def test_shingles_short_text():
    assert oracle.shingles([], 5) == []
    assert oracle.shingles(["a"], 5) == ["a"]
    assert oracle.shingles(["a", "b"], 5) == ["a b"]
    assert oracle.shingles(["a", "b", "c"], 2) == ["a b", "b c"]


def test_tokenizer_unicode_parity_with_oracle(spark):
    """Java-regex (Spark) and python-re (oracle) canonicalization agree
    on non-ASCII scripts, supplementary-plane emoji, case-folding
    specials (Turkish I, German sharp-s, Greek sigma) and ligatures."""
    import pyspark.sql.functions as F

    from lieu_spark import oracle
    from lieu_spark.functions.text import tokenize

    cases = [
        "héllo wörld café",
        "日本語のテキスト 処理",
        "emoji 😀 mix 🎉 text",
        "İstanbul DİYARBAKIR ısparta",
        "éclair séance",
        "МОСКВА советский Союз",
        "ΑΘΗΝΑ ελληνικά ΣΟΦΙΑ",
        "mixed١٢٣ arabic نص عربي",
        "ÄÖÜ ß STRASSE straße",
        "ﬁnancial ﬂow",
        "tab\tand\nnewline  runs",
        "punct!!!only??? ... ---",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, text string"
    )
    got = {r.i: r.t for r in df.select("i", tokenize(F.col("text")).alias("t")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == oracle.tokens(c), (c, got[i], oracle.tokens(c))


def test_safe_decode_utf8_and_latin1_fallback(spark):
    from pyspark.sql import functions as F

    from lieu_spark.functions.text import is_utf8, safe_decode

    df = spark.createDataFrame(
        [
            (0, "plain ascii".encode("utf-8")),
            (1, "héllo wörld".encode("utf-8")),
            (2, "café crème".encode("latin-1")),
            (3, b"\xff\xfe mixed \xe9 bytes"),
            (4, b""),
        ],
        ["i", "b"],
    )
    rows = {
        r.i: (r.s, r.f)
        for r in df.select(
            "i",
            safe_decode(F.col("b")).alias("s"),
            is_utf8(F.col("b")).alias("f"),
        ).collect()
    }
    assert rows[0] == ("plain ascii", True)
    assert rows[1] == ("héllo wörld", True)
    assert rows[2] == ("café crème".encode("latin-1").decode("latin-1"), False)
    assert rows[3] == (b"\xff\xfe mixed \xe9 bytes".decode("latin-1"), False)
    assert rows[4] == ("", True)
