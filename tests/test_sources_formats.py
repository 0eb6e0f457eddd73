"""CSV/TSV and ORC transcript ingest: schema-enforced roundtrips and
the shared malformed-row policy (null conv_id / turn_idx dropped)."""

import datetime

from lieu_spark.sources.io import (
    TRANSCRIPT_SCHEMA,
    read_transcripts_csv,
    read_transcripts_orc,
    write_orc,
)

_ROWS = [
    ("c1", 0, "user", "hello there", "none", datetime.datetime(2026, 1, 2, 3, 4, 5)),
    ("c1", 1, "assistant", "hi, how can I help", "search",
     datetime.datetime(2026, 1, 2, 3, 4, 6, 250000)),
    ("c2", 0, "user", "unrelated", "none", datetime.datetime(2026, 2, 3, 4, 5, 6)),
]


def _df(spark):
    return spark.createDataFrame(_ROWS, TRANSCRIPT_SCHEMA)


def test_csv_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    _df(spark).write.option("header", "true").csv(p)
    back = read_transcripts_csv(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(_ROWS)
    # file sources relax declared non-nullability; names+types must hold
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA
    ]


def test_tsv_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "t.tsv")
    _df(spark).write.option("header", "true").option("sep", "\t").csv(p)
    back = read_transcripts_csv(spark, p, sep="\t")
    assert sorted(map(tuple, back.collect())) == sorted(_ROWS)


def test_csv_drops_rows_missing_sort_key(spark, tmp_path):
    p = str(tmp_path / "bad.csv")
    (tmp_path / "bad.csv").mkdir()
    (tmp_path / "bad.csv" / "part.csv").write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,0,user,ok,none,2026-01-02T03:04:05\n"
        ",1,user,no conv id,none,2026-01-02T03:04:05\n"
        "c1,,user,no turn idx,none,2026-01-02T03:04:05\n"
        "c1,notanint,user,malformed idx,none,2026-01-02T03:04:05\n"
    )
    back = read_transcripts_csv(spark, p)
    assert [r.text for r in back.collect()] == ["ok"]


def test_orc_roundtrip_exact(spark, tmp_path):
    p = str(tmp_path / "t.orc")
    write_orc(_df(spark), p)
    back = read_transcripts_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(_ROWS)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in TRANSCRIPT_SCHEMA
    ]


def test_csv_roundtrip_embedded_newlines(spark, tmp_path):
    """Transcript text with embedded newlines: Spark's CSV writer quotes
    them; reading back needs multiLine or the record splits at the
    newline and PERMISSIVE silently drops both fragments."""
    rows = [
        ("c1", 0, "user", "line one\nline two\nline three", "none",
         datetime.datetime(2026, 1, 2, 3, 4, 5)),
        ("c1", 1, "assistant", "single line", "search",
         datetime.datetime(2026, 1, 2, 3, 4, 6)),
    ]
    p = str(tmp_path / "nl.csv")
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.option(
        "header", "true"
    ).csv(p)
    back = read_transcripts_csv(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_csv_reordered_header_fails_loudly(spark, tmp_path):
    # enforceSchema=False: a header whose column order differs from
    # TRANSCRIPT_SCHEMA must ERROR, not positionally load role strings
    # into turn_idx (silent all-null corpus) — write swapped columns
    import pytest

    out = tmp_path / "swapped"
    _df(spark).select(
        "conv_id", "role", "turn_idx", "text", "tool", "ts"
    ).coalesce(1).write.option("header", True).csv(str(out))
    with pytest.raises(Exception, match="(?i)header|schema"):
        read_transcripts_csv(spark, str(out)).count()
