"""Invariant + property tests (SURVEY.md §5.3-5.4)."""

from datetime import datetime

from pyspark.sql import functions as F

from lieu_spark import corpus
from lieu_spark.config import DedupeConfig
from lieu_spark.operators.assemble import assemble_conversations
from lieu_spark.operators.lsh import band_table, candidate_pairs
from lieu_spark.pipeline import build_features

CFG = DedupeConfig()


def _tdf(spark, rows):
    return spark.createDataFrame(
        [(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in rows],
        corpus.TRANSCRIPT_SCHEMA,
    )


def test_permuted_ingestion_same_output(spark):
    rows = corpus.generate_rows(7, 40)
    fwd = assemble_conversations(_tdf(spark, rows)).select("conv_id", "text_sha")
    rev = assemble_conversations(_tdf(spark, list(reversed(rows)))).select(
        "conv_id", "text_sha"
    )
    assert {tuple(r) for r in fwd.collect()} == {tuple(r) for r in rev.collect()}


def test_duplicate_input_rows_idempotent(spark):
    rows = corpus.generate_rows(7, 20)
    doubled = rows + rows  # same (conv_id, turn_idx) duplicated
    a = assemble_conversations(_tdf(spark, rows)).select("conv_id", "n_turns", "text_sha")
    b = assemble_conversations(_tdf(spark, doubled)).select("conv_id", "n_turns", "text_sha")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_pair_normalization(spark):
    rows = corpus.generate_rows(42, 100)
    feats = build_features(assemble_conversations(_tdf(spark, rows)), CFG)
    pairs = candidate_pairs(band_table(feats, CFG), CFG).collect()
    assert all(r.id_a < r.id_b for r in pairs)
    assert len({(r.id_a, r.id_b) for r in pairs}) == len(pairs)


def test_candidate_pairs_partition_independence(spark):
    rows = corpus.generate_rows(42, 100)
    feats = build_features(assemble_conversations(_tdf(spark, rows)), CFG)
    b1 = band_table(feats.repartition(1), CFG)
    b8 = band_table(feats.repartition(8), CFG)
    p1 = {(r.id_a, r.id_b) for r in candidate_pairs(b1, CFG).collect()}
    p8 = {(r.id_a, r.id_b) for r in candidate_pairs(b8, CFG).collect()}
    assert p1 == p8


def test_hot_band_split_preserves_some_and_caps_blowup(spark):
    """A band with 30 identical members under cap=10 still pairs within
    sub-groups; pair count is bounded by sub-group sizes."""
    from lieu_spark.config import DedupeConfig as DC

    cfg = DC(hot_band_cap=10)
    # 30 ids all sharing one band key
    bands = spark.createDataFrame(
        [(f"id{i:02d}", 0, 999) for i in range(30)], "id string, band long, band_hash long"
    )
    pairs = candidate_pairs(bands, cfg).collect()
    n = len(pairs)
    assert 0 < n < 30 * 29 / 2  # strictly fewer than the full quadratic
    assert all(r.id_a < r.id_b for r in pairs)


def test_empty_docs_exact_only(spark):
    """Content-empty conversations never pair by similarity; byte-identical
    docs (including empty) pair via the exact-sha star path."""
    from datetime import datetime

    from lieu_spark.api import dedupe

    ts = datetime(2025, 1, 1)
    rows = [
        ("w1", 0, "user", None, "", ts),
        ("w2", 0, "user", "", "", ts),
        ("w3", 0, "user", "   \t\n ", "", ts),
        ("w4", 0, "user", "short", "", ts),
        ("w5", 0, "user", "short", "", ts),
    ]
    res = dedupe(spark, spark.createDataFrame(rows, corpus.TRANSCRIPT_SCHEMA), CFG)
    pairs = {(r.id_a, r.id_b): r.status for r in res.verified.collect()}
    dupes = {p for p, s in pairs.items() if s in ("exact_duplicate", "likely_duplicate")}
    # w1(null) and w2("") assemble to the same empty doc -> exact dupes;
    # w3 (whitespace, different bytes) pairs with neither; w4/w5 exact.
    assert dupes == {("w1", "w2"), ("w4", "w5")}
    clusters = {r.conv_id: r.cluster_id for r in res.clusters.collect()}
    assert clusters == {"w1": "w1", "w2": "w1", "w3": "w3", "w4": "w4", "w5": "w4"}


def test_corpus_spark_generation_matches_pure_python(spark):
    want = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in corpus.generate_rows(42, 60)
    }
    got = {
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in corpus.generate_df(spark, 42, 60, partitions=5).collect()
    }
    assert got == want


def test_ts_types(spark):
    df = corpus.generate_df(spark, 42, 5)
    row = df.first()
    assert isinstance(row.ts, datetime)
    assert df.schema["turn_idx"].dataType.simpleString() == "int"


def test_assembly_turn_cap_bounds_pathological_conversations(spark):
    """max_turns keeps the deterministic lowest-turn_idx prefix and flags
    truncation — the assembly-stage analog of hot_band_cap."""
    from datetime import datetime, timedelta

    from lieu_spark.operators.assemble import assemble_conversations

    base = datetime(2025, 1, 1)
    rows = [
        ("big", t, "user", f"turn number {t}", "", base + timedelta(seconds=t))
        for t in range(30)
    ] + [
        ("small", t, "user", f"word {t}", "", base + timedelta(seconds=t))
        for t in range(3)
    ]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    capped = {r.conv_id: r for r in assemble_conversations(tdf, max_turns=10).collect()}
    assert capped["big"].n_turns == 10
    assert capped["big"].truncated is True
    assert capped["big"].doc == "\n".join(f"turn number {t}" for t in range(10))
    assert capped["small"].n_turns == 3
    assert capped["small"].truncated is False
    assert capped["small"].doc == "\n".join(f"word {t}" for t in range(3))
    # scrambled ingestion order yields the identical capped prefix
    shuffled = spark.createDataFrame(list(reversed(rows)), tdf.schema)
    again = {r.conv_id: r.doc for r in assemble_conversations(shuffled, max_turns=10).collect()}
    assert again == {k: v.doc for k, v in capped.items()}
    # default path keeps its schema (no truncated column)
    assert "truncated" not in assemble_conversations(tdf).columns


def test_assembly_drops_null_keys_on_every_path(spark):
    """Null conv_id / null turn_idx rows are dropped at the assembly
    choke point, not only in some ingest wrappers — so text_sha (and
    every dedupe verdict derived from it) cannot depend on which ingest
    path a conversation arrived through."""
    ts = datetime(2026, 1, 1)
    base = [("c1", 0, "user", "hello world", None, ts),
            ("c1", 1, "asst", "general reply", None, ts)]
    noisy = base + [
        ("c1", None, "user", "floating turn", None, ts),  # null turn_idx
        (None, 0, "user", "orphan", None, ts),            # null conv_id
    ]
    schema = corpus.TRANSCRIPT_SCHEMA
    clean = assemble_conversations(spark.createDataFrame(base, schema))
    dirty = assemble_conversations(spark.createDataFrame(noisy, schema))
    got_clean = {(r.conv_id, r.n_turns, r.text_sha) for r in clean.collect()}
    got_dirty = {(r.conv_id, r.n_turns, r.text_sha) for r in dirty.collect()}
    assert got_clean == got_dirty and len(got_dirty) == 1


def test_null_and_empty_text_assemble_identically(spark):
    """A multi-turn conv with one NULL-text turn must assemble to the
    same doc/text_sha as the same conv with ''-text (concat_ws would
    otherwise SKIP the null but keep the empty) — CSV ingest conflates
    the two, so verdicts must not depend on the distinction."""
    ts = datetime(2025, 1, 1)
    a = [("x", 0, "user", "alpha", "", ts), ("x", 1, "assistant", None, "", ts),
         ("x", 2, "user", "omega", "", ts)]
    b = [("y", 0, "user", "alpha", "", ts), ("y", 1, "assistant", "", "", ts),
         ("y", 2, "user", "omega", "", ts)]
    out = assemble_conversations(
        spark.createDataFrame(a + b, corpus.TRANSCRIPT_SCHEMA)
    ).select("conv_id", "doc", "text_sha").collect()
    d = {r.conv_id: (r.doc, r.text_sha) for r in out}
    assert d["x"] == d["y"]  # same doc AND same sha


def test_csv_ingest_verdict_parity(spark, tmp_path):
    """Dedupe verdicts must be identical whether transcripts arrive as
    a DataFrame or through the CSV reader (empty-vs-null conflation and
    quoted newlines are the two lossy spots CSV introduces)."""
    from lieu_spark.api import dedupe
    from lieu_spark.sources.io import read_transcripts_csv

    rows = corpus.generate_rows(11, 60)
    tdf = _tdf(spark, rows)
    p = str(tmp_path / "t.csv")
    tdf.write.option("header", "true").csv(p)
    direct = dedupe(spark, tdf, CFG)
    via_csv = dedupe(spark, read_transcripts_csv(spark, p), CFG)
    key = lambda df: sorted(  # noqa: E731
        (r.id_a, r.id_b, r.status) for r in df.verified.collect()
    )
    assert key(direct) == key(via_csv)


def test_empty_docs_exact_only_signatures_mode(spark):
    """The empty-doc policy holds under verify_mode='signatures' too:
    two content-empty docs both carry the all-sentinel MinHash
    signature (stored long -1) and used to agree 128/128, classifying
    byte-DIFFERENT empty docs likely_duplicate. J(∅,∅) := 0 in every
    verify mode; empties pair only via the exact byte-hash path."""
    from datetime import datetime

    from lieu_spark.api import dedupe
    from lieu_spark.config import DedupeConfig

    ts = datetime(2025, 1, 1)
    rows = [
        ("w1", 0, "user", None, "", ts),
        ("w2", 0, "user", "", "", ts),
        ("w3", 0, "user", "   \t\n ", "", ts),
        ("w4", 0, "user", "short", "", ts),
        ("w5", 0, "user", "short", "", ts),
    ]
    cfg = DedupeConfig(verify_mode="signatures")
    res = dedupe(spark, spark.createDataFrame(rows, corpus.TRANSCRIPT_SCHEMA), cfg)
    pairs = {(r.id_a, r.id_b): r.status for r in res.verified.collect()}
    dupes = {p for p, s in pairs.items() if s in ("exact_duplicate", "likely_duplicate")}
    assert dupes == {("w1", "w2"), ("w4", "w5")}
