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
