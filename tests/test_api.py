"""Library API parity: match() and unique()
(reference: lib/lieu/spark/dedupe.py:24-48,109-115)."""

from lieu_spark import corpus
from lieu_spark.api import match, unique
from lieu_spark.config import DedupeConfig

CFG = DedupeConfig()


def _tdf(spark, rows):
    return spark.createDataFrame(
        [(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in rows],
        corpus.TRANSCRIPT_SCHEMA,
    )


def test_match_finds_cross_set_dupes(spark):
    rows = corpus.generate_rows(42, 30)
    # canonical = conversations 0..19; incoming = copies of 0..4 under new ids
    canon_rows = [r for r in rows if int(r.conv_id[1:]) < 20]
    incoming = []
    for r in canon_rows:
        i = int(r.conv_id[1:])
        if i < 5:
            incoming.append(
                corpus.TurnRow(f"n{i:09d}", r.turn_idx, r.role, r.text, r.tool, r.ts)
            )
    got = match(spark, _tdf(spark, canon_rows), _tdf(spark, incoming), CFG)
    pairs = {(r.canonical_id, r.incoming_id): r.status for r in got.collect()}
    for i in range(5):
        key = (corpus.conv_id_str(i), f"n{i:09d}")
        assert pairs.get(key) == "exact_duplicate", pairs


def test_unique_drops_dupes_keeps_canonical(spark):
    rows = corpus.generate_rows(42, 40)  # indices 7,17,27,37 exact copies
    uniq = unique(spark, _tdf(spark, rows), CFG)
    ids = {r.conv_id for r in uniq.select("conv_id").collect()}
    # exact copies (i%10==7) must be dropped; their sources kept
    for i in range(40):
        if i % 10 == 7:
            assert corpus.conv_id_str(i) not in ids
            assert corpus.conv_id_str(i - 7) in ids
