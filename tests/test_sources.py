"""Source/sink roundtrips (SURVEY §2.1) including compressed JSON lines
and malformed-row handling."""

import bz2
import json

from lieu_spark import corpus
from lieu_spark.sources.io import (
    parse_transcript_lines,
    read_transcripts_json,
    read_transcripts_parquet,
    write_json,
    write_tsv,
)


def _rows(n=12):
    return corpus.generate_rows(42, n)


def _key(r):
    return (r.conv_id, r.turn_idx, r.role, r.text, r.tool)


def test_jsonl_roundtrip_plain_and_bz2(spark, tmp_path):
    rows = _rows()
    payload = "\n".join(
        json.dumps(
            {
                "conv_id": r.conv_id,
                "turn_idx": r.turn_idx,
                "role": r.role,
                "text": r.text,
                "tool": r.tool,
                "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        for r in rows
    )
    plain = tmp_path / "t.jsonl"
    plain.write_text(payload)
    compressed = tmp_path / "t2" / "t.jsonl.bz2"
    compressed.parent.mkdir()
    compressed.write_bytes(bz2.compress(payload.encode()))

    want = {_key(r) for r in rows}
    got_plain = {_key(r) for r in read_transcripts_json(spark, str(plain)).collect()}
    got_bz2 = {
        _key(r) for r in read_transcripts_json(spark, str(compressed)).collect()
    }
    assert got_plain == want
    assert got_bz2 == want


def test_from_json_lines_with_malformed(spark):
    rows = _rows(4)
    lines = [
        json.dumps(
            {
                "conv_id": r.conv_id,
                "turn_idx": r.turn_idx,
                "role": r.role,
                "text": r.text,
                "tool": r.tool,
                "ts": r.ts.isoformat(),
            }
        )
        for r in rows
    ] + ["{not json", '{"no_conv_id": 1}']
    df = spark.createDataFrame([(line,) for line in lines], ["value"])
    parsed = parse_transcript_lines(df)
    assert parsed.count() == len(rows)
    assert {_key(r) for r in parsed.collect()} == {_key(r) for r in rows}


def test_parquet_and_sinks_roundtrip(spark, tmp_path):
    df = corpus.generate_df(spark, 42, 10)
    pq = str(tmp_path / "pq")
    df.write.parquet(pq)
    back = read_transcripts_parquet(spark, pq)
    assert back.count() == df.count()
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in df.schema.fields
    ]

    write_json(back.select("conv_id", "turn_idx", "text"), str(tmp_path / "js"))
    write_tsv(back.select("conv_id", "turn_idx", "text"), str(tmp_path / "tsv"))
    js = spark.read.json(str(tmp_path / "js"))
    assert js.count() == df.count()
    tsv = (
        spark.read.option("sep", "\t").option("header", "true").csv(str(tmp_path / "tsv"))
    )
    assert tsv.count() == df.count()


def test_alias_map_ingest_roundtrip(spark):
    """Heterogeneous multi-source export ingests to TRANSCRIPT_SCHEMA
    (lib/lieu/address.py:41-169 analog): aliases coalesce in priority
    order, canonical names win, malformed values degrade to NULL (row
    dropped when the null hits conv_id/turn_idx), junk columns vanish."""
    from lieu_spark.operators.assemble import assemble_conversations
    from lieu_spark.sources.io import TRANSCRIPT_SCHEMA, coalesce_aliases

    rows = [
        # source A: session_id/turn/speaker/content/created_at + junk
        {"session_id": "s1", "turn": "0", "speaker": "user",
         "content": "hello there", "created_at": "2026-01-01 10:00:00",
         "junk": "zzz"},
        {"session_id": "s1", "turn": "1", "speaker": "assistant",
         "content": "hi back", "created_at": "2026-01-01 10:00:05",
         "junk": "zzz"},
        # canonical name outranks alias: text wins over content
        {"session_id": "s2", "turn": "0", "speaker": "user",
         "content": "WRONG", "text": "right text",
         "created_at": "2026-01-01 11:00:00", "junk": None},
        # malformed turn -> try_cast NULL -> row dropped
        {"session_id": "s3", "turn": "not-a-number", "speaker": "user",
         "content": "dropped row", "created_at": "bad ts", "junk": None},
    ]
    df = spark.createDataFrame(
        rows,
        "session_id string, turn string, speaker string, content string, "
        "text string, created_at string, junk string",
    )
    got = coalesce_aliases(df)
    assert got.schema == TRANSCRIPT_SCHEMA or [
        (f.name, f.dataType) for f in got.schema.fields
    ] == [(f.name, f.dataType) for f in TRANSCRIPT_SCHEMA.fields]
    out = {(r.conv_id, r.turn_idx): r for r in got.collect()}
    assert set(out) == {("s1", 0), ("s1", 1), ("s2", 0)}
    assert out[("s1", 0)].text == "hello there"
    assert out[("s1", 0)].role == "user"
    assert out[("s1", 0)].ts is not None
    assert out[("s2", 0)].text == "right text"
    # the ingested frame drives assembly directly
    conv = {r.conv_id: r.doc for r in
            assemble_conversations(got).select("conv_id", "doc").collect()}
    assert conv[("s1")] == "hello there\nhi back"


def test_alias_map_ingest_mixed_native_types(spark):
    """Alias columns of MIXED native types must not throw under ANSI:
    coalescing a BIGINT turn_idx with a malformed STRING 'turn' used to
    insert a strict cast inside COALESCE (CAST_INVALID_INPUT at
    runtime). Per-column try_cast degrades the malformed value to NULL,
    which also lets it fall through to the next present alias."""
    from lieu_spark.sources.io import coalesce_aliases

    df = spark.createDataFrame(
        [
            ("s1", None, "0", "user", "native int missing, string alias ok"),
            ("s2", 3, "junk", "user", "native int present, string alias junk"),
            ("s3", None, "junk", "user", "both unusable -> row dropped"),
        ],
        "conv_id string, turn_idx long, turn string, role string, text string",
    )
    out = {(r.conv_id, r.turn_idx) for r in coalesce_aliases(df).collect()}
    assert out == {("s1", 0), ("s2", 3)}


def test_alias_map_unknown_key_raises(spark):
    """A typo'd extra_aliases key must fail loudly — the output loop
    iterates canonical fields only, so it would otherwise be silently
    ignored and ship an all-null column."""
    import pytest

    from lieu_spark.sources.io import coalesce_aliases

    df = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    with pytest.raises(ValueError, match="timestmap"):
        coalesce_aliases(df, extra_aliases={"timestmap": ["event_ts"]})


def test_parse_lines_drops_null_turn_idx(spark):
    """A JSON line without turn_idx has no stable position in the
    assembled doc — same drop policy as coalesce_aliases, so dedupe
    results cannot depend on the ingest path."""
    rows = [
        ('{"conv_id":"c1","turn_idx":0,"role":"user","text":"a"}',),
        ('{"conv_id":"c1","role":"user","text":"b"}',),  # no turn_idx
        ('{"role":"user","text":"c"}',),  # no conv_id either
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_transcript_lines(df).collect()
    assert len(out) == 1 and out[0].turn_idx == 0


def test_alias_map_case_insensitive_columns(spark):
    # warehouse exports routinely upper-case headers: CONV_ID/TEXT must
    # resolve like Spark's own case-insensitive column resolution, not
    # silently become all-null and get dropped by the null-key filter
    from lieu_spark.sources.io import coalesce_aliases

    df = spark.createDataFrame(
        [("c1", "0", "user", "hello")],
        "CONV_ID string, Turn_Idx string, ROLE string, TEXT string",
    )
    out = coalesce_aliases(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.conv_id == "c1" and r.turn_idx == 0
    assert r.role == "user" and r.text == "hello"


def test_json_reader_drops_malformed_rows(spark, tmp_path):
    # the file reader enforces the SAME malformed-row policy as
    # parse_transcript_lines/coalesce_aliases/CSV: a PERMISSIVE row
    # with null keys must not survive one ingest path and not another
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,"ts":null}\n'
        '{"conv_id":null,"turn_idx":0,"role":"user","text":"ghost"}\n'
        '{"conv_id":"c2","turn_idx":null,"role":"user","text":"ghost2"}\n'
    )
    rows = read_transcripts_json(spark, str(p)).collect()
    assert [r.conv_id for r in rows] == ["c1"]


def test_alias_map_missing_required_key_raises(spark):
    from lieu_spark.sources.io import coalesce_aliases

    df = spark.createDataFrame(
        [("x", 0, "user", "hi")], "convo_id string, turn_idx int, role string, text string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conv_id"):
        coalesce_aliases(df)
