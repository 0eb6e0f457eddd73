"""Event-time windowed aggregations with watermarked late-data handling.

The reference has no streaming (SURVEY.md §2.9); this is the task
brief's "watermarks + windowed aggs for late data" component, applied
to the engine's operational telemetry shape: counting events (or
arriving turns) per tumbling event-time window.

Scale shape: `groupBy(window(ts), key)` is a keyed shuffle whose state
store only retains windows newer than the watermark — memory is bounded
by (watermark horizon / window size) * |keys| regardless of stream
length, which is what makes it viable on an unbounded 100 TB/day feed.
Late rows inside the watermark update their window (append emits on
watermark passage); rows later than the watermark are dropped — the
documented, deterministic late-data policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp, props string"
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event rows (parquet files landing in a
    directory); Kafka/Iceberg-CDC in production."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works identically on a streaming or a batch DataFrame (the batch
    run is the correctness oracle for the streamed run: same input =>
    same rows once the stream drains). Null-ts rows are dropped on
    BOTH paths — the watermark silently discards them on the stream,
    so the batch oracle must apply the same policy (it would otherwise
    emit a null-window row the stream never produces)."""
    src = events.filter(F.col("ts").isNotNull())
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


def dedupe_turns_within_watermark(
    turns: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once ingestion of turn rows from an at-least-once feed:
    drop re-deliveries of the same (conv_id, turn_idx) arriving within
    the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keys the state store on the id
    columns and expires entries once the watermark passes their event
    time — state is bounded by (horizon x arrival rate) regardless of
    stream length, unlike streaming ``dropDuplicates`` whose state grows
    forever. Re-deliveries later than the horizon are out of contract
    (the batch pipeline's assembly dedupe is the backstop — duplicated
    (conv_id, turn_idx) rows are idempotent there, tests/
    test_properties.py)."""
    # null-ts rows are dropped on BOTH paths: the watermarked stream
    # silently treats a null event time as late (the row vanishes), so
    # the batch fallback must apply the same policy or the "batch run
    # is the correctness oracle" claim breaks on exactly those rows —
    # same convention as stateful.assemble_stream
    turns = turns.filter(F.col("ts").isNotNull())
    if turns.isStreaming:
        return turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["conv_id", "turn_idx"]
        )
    return turns.dropDuplicates(["conv_id", "turn_idx"])


def run_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Drain whatever is in ``input_dir`` (availableNow) into a parquet
    sink in append mode. Append-mode windows emit only once the
    watermark passes their END, and the watermark is max-event-time
    minus the ``watermark`` horizon — so a drained finite stream
    WITHHOLDS every window ending within the horizon of the newest
    event (they stay in the state store until later data advances the
    watermark; the checkpoint resumes them on the next run). That is
    the correct late-data contract for a continuous feed; for a
    finite-batch drain that must flush everything, append a sentinel
    event beyond the horizon (tests/test_streaming_windows.py does
    exactly this) or compute the counts with a batch groupBy."""
    counts = windowed_event_counts(stream_events(spark, input_dir), window, watermark)
    q = (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
