"""Event-time tumbling-window aggregation with watermark: the streamed
(append-mode) result must equal the batch run on the same input once
the stream drains — the batch DataFrame is the oracle."""

import pytest
from pyspark.sql import functions as F

from lieu_spark.streaming.windows import run_windowed_counts, windowed_event_counts

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # land the real events as several files (several micro-batches)
    events.repartition(3).write.mode("append").parquet(str(in_dir))
    # watermark flusher: one event far past the last real window end so
    # append mode emits every real window before the drain finishes
    max_ts = events.agg(F.max("ts")).first()[0]
    flusher = spark.createDataFrame(
        [(10**9, 10**6, "__flush__", max_ts, "{}")],
        "event_id bigint, user_id bigint, event_type string, ts timestamp, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    flusher.coalesce(1).write.mode("append").parquet(str(in_dir))

    run_windowed_counts(
        spark,
        str(in_dir),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        window="1 hour",
        watermark="2 hours",
    )

    streamed = spark.read.parquet(str(tmp_path / "out")).filter(
        F.col("event_type") != "__flush__"
    )
    batch = windowed_event_counts(
        spark.read.parquet(str(in_dir)), window="1 hour"
    ).filter(F.col("event_type") != "__flush__")

    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert len(b) > 10, "corpus must span multiple windows"
    assert s == b, (sorted(b - s)[:3], sorted(s - b)[:3])


def test_windowed_counts_batch_matches_manual(spark):
    """The shared batch/stream aggregation, cross-checked against a
    hand-rolled floor-to-hour groupBy."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = windowed_event_counts(events, window="1 hour").select(
        "win_start", "event_type", "n_events"
    )
    manual = (
        events.withColumn("win_start", F.date_trunc("hour", "ts"))
        .groupBy("win_start", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in manual.collect()}
