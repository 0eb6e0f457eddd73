"""Bucketed stage tables eliminate the join/agg exchange — the plan
proof for the north rule's bucket(conv_id) table layout (SURVEY §7.2
M5). Both sides bucketed on the join key with the same bucket count =>
SortMergeJoin with ZERO Exchange operators; groupBy on the bucket key
=> aggregation with no Exchange."""

import pytest
from pyspark.sql import functions as F

from lieu_spark import corpus
from lieu_spark.config import DedupeConfig
from lieu_spark.operators.assemble import assemble_conversations
from lieu_spark.pipeline import build_features
from lieu_spark.sources.io import write_bucketed

from test_plans import plan_of

CFG = DedupeConfig()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_convs_b", "t_feats_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    tdf = corpus.generate_df(spark, 42, 80)
    convs = assemble_conversations(tdf)
    feats = build_features(convs, CFG).select("conv_id", "sig")
    write_bucketed(convs, "t_convs_b", 4, "conv_id")
    write_bucketed(feats, "t_feats_b", 4, "conv_id")
    yield "t_convs_b", "t_feats_b"
    spark.sql("DROP TABLE IF EXISTS t_convs_b")
    spark.sql("DROP TABLE IF EXISTS t_feats_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ct, ft = bucketed_tables
    # merge hint: at test scale Catalyst would broadcast (also
    # shuffle-free, but that proves nothing); at 100 TB both sides are
    # too big to broadcast and SMJ-over-buckets is the real plan
    j = (
        spark.table(ct)
        .hint("merge")
        .join(spark.table(ft).hint("merge"), "conv_id")
        .select("conv_id", "doc", "sig")
    )
    plan = plan_of(j, "simple")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    # bucketed scans on both sides, all buckets selected
    assert plan.count("Bucketed: true") == 2, plan
    # (a Sort node remains: since SPARK-28632 Spark does not trust
    # bucketed-scan output ordering. The shuffle — the cost that grows
    # with cluster size — is what bucketing removes; the in-partition
    # sort is local and spillable.)
    # and the result is right
    assert j.count() == spark.table(ct).count()


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    ct, _ = bucketed_tables
    agg = spark.table(ct).groupBy("conv_id").agg(F.count("*").alias("n"))
    plan = plan_of(agg, "simple")
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join against a plain DataFrame needs an
    Exchange — i.e. the elimination above is the bucketing, not AQE."""
    ct, _ = bucketed_tables
    plain = spark.table(ct).select("conv_id", "n_turns").localCheckpoint()
    j = spark.table(ct).join(plain, "conv_id")
    plan = plan_of(j, "simple")
    assert "Exchange" in plan
