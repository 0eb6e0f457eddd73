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
