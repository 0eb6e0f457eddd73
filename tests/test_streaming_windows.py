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


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    """At-least-once feed: the same (conv_id, turn_idx) rows delivered in
    two files must come out exactly once; output equals batch distinct."""
    from lieu_spark import corpus
    from lieu_spark.streaming.windows import dedupe_turns_within_watermark

    in_dir = tmp_path / "turns_in"
    in_dir.mkdir()
    tdf = corpus.generate_df(spark, 11, 40)
    tdf.coalesce(1).write.mode("append").parquet(str(in_dir))
    # redeliver half the rows (duplicates within the watermark horizon)
    tdf.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))

    stream = (
        spark.readStream.schema(corpus.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    deduped = dedupe_turns_within_watermark(stream, watermark="2 hours")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(tmp_path / "turns_out"))
        .option("checkpointLocation", str(tmp_path / "turns_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(tmp_path / "turns_out"))
    n_in = spark.read.parquet(str(in_dir)).count()
    n_unique = tdf.count()
    assert n_in > n_unique  # duplicates were actually delivered
    assert got.count() == n_unique
    assert got.select("conv_id", "turn_idx").distinct().count() == n_unique
    # batch path of the same helper equals streaming output row-for-row
    batch = dedupe_turns_within_watermark(spark.read.parquet(str(in_dir)))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}


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
