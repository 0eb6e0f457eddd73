"""Boilerplate-skew stress: a giant identical-text group must stay
LINEAR through candidate generation (rep-per-sha banding + exact star),
never quadratic — the failure mode that kills 100 TB dedupe runs."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lieu_spark import corpus
from lieu_spark.config import DedupeConfig
from lieu_spark.pipeline import run_pipeline

CFG = DedupeConfig()


@pytest.mark.slow
def test_boilerplate_group_stays_linear(spark):
    n_copies, n_bg = 3000, 200
    ts = datetime(2025, 1, 1)
    boiler = "thank you for contacting support your ticket has been received " * 6
    rows = [(f"b{i:06d}", 0, "user", boiler, "", ts) for i in range(n_copies)]
    bg = corpus.generate_rows(7, n_bg)
    rows += [(r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts) for r in bg]
    tdf = spark.createDataFrame(rows, corpus.TRANSCRIPT_SCHEMA)

    res = run_pipeline(spark, tdf, CFG, with_spans=False)
    n_candidates = res.candidates.count()
    # linear: 2999 exact-star edges + background LSH pairs; a quadratic
    # regression would be ~4.5M pairs
    assert n_candidates < n_copies + 5 * n_bg, n_candidates

    clusters = {r.conv_id: r.cluster_id for r in res.clusters.collect()}
    boiler_clusters = {clusters[f"b{i:06d}"] for i in range(n_copies)}
    assert boiler_clusters == {"b000000"}
    # every boilerplate member pairs exactly once (to the rep)
    star = res.verified.filter(F.col("status") == "exact_duplicate").count()
    assert star >= n_copies - 1


def test_simhash_hot_chunk_stays_bounded(spark):
    """NEAR-identical (not byte-identical) boilerplate shares simhash
    chunk values; the salted sub-split must keep the chunk self-join
    from going quadratic while still surfacing near-dup pairs."""
    from lieu_spark.functions.simhash import with_simhash
    from lieu_spark.functions.text import token_hashes, tokenize
    from lieu_spark.operators.simhash_path import simhash_candidate_pairs

    cfg = DedupeConfig(simhash_hot_chunk_cap=50)  # opt-in salting
    boiler = "thank you for contacting support your ticket has been received " * 6
    # unique suffix token => distinct text_sha, near-identical simhash
    rows = [(f"c{i:05d}", boiler + f" case{i}") for i in range(800)]
    df = spark.createDataFrame(rows, "conv_id string, doc string")
    df = df.withColumn("tokens", tokenize(F.col("doc")))
    df = df.withColumn("token_hashes", token_hashes(F.col("tokens")))
    feats = with_simhash(df, cfg)

    pairs = simhash_candidate_pairs(feats, cfg)
    n = pairs.count()
    # unsalted would be ~800*799/2 = 319,600 per colliding chunk; the
    # cap bounds each sub-group to ~50 members -> ~20k pairs max
    assert 0 < n < 50_000, n
    # pairs that survive are genuinely near-exact (hamming filter)
    assert pairs.filter(F.col("hamming") > cfg.simhash_hamming_max).count() == 0
