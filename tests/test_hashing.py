"""Bit-equality of the pure-python XXH64 oracle vs Spark's xxhash64 —
the keystone of every downstream parity test."""

from pyspark.sql import functions as F

from lieu_spark.hashing import xxh64_chain, xxh64_long, xxh64_string

STRINGS = [
    "",
    "a",
    "abc",
    "hello world",
    "x" * 31,
    "y" * 32,
    "z" * 100,
    "café über straße",
    "日本語テスト",
    "tab\tnew\nline",
    "a b c d e",
]
LONGS = [0, 1, -1, 42, 2**62, -(2**62), 1234567890123456789, -(2**63)]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], ["s"])
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64_string(s) for s in STRINGS]


def test_long_hash_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v: long")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    assert got == [xxh64_long(v) for v in LONGS]


def test_chained_hash_matches_spark(spark):
    rows = [(3, [1, 2, 3, 4]), (0, []), (7, [-5, 2**60]), (31, [0, 0, 0, 0])]
    df = spark.createDataFrame(rows, "band: long, sig: array<long>")
    got = [r[0] for r in df.select(F.xxhash64("band", "sig")).collect()]
    assert got == [xxh64_chain([b, s]) for b, s in rows]
