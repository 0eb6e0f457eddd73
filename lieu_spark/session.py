"""SparkSession factory with the engine's physical config.

Replaces the reference's hand-tuned EMR jobconf
(/root/reference/scripts/jobs/mrjob.conf.example:13-34) with AQE-first
settings: adaptive partition coalescing supersedes lieu's manual
``coalesce(num_partitions)`` after every expansion
(lib/lieu/spark/dedupe.py:48,73,84,...), and AQE skew-join splitting is the
first line of defense before our explicit hot-band handling kicks in.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "lieu_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: ONE wave (sp == cores). Measured A/B in separate
        # processes at both 8 and 32 threads: one wave beats two by
        # 4-15% because this pipeline's shuffles are short and
        # dispatch-bound — doubling the task count doubles scheduling
        # overhead without improving balance (AQE coalesces bytes, not
        # task-dispatch cost). On a real cluster size this to input
        # volume instead: ~2-3x total executor cores, or a high initial
        # count + AQE coalescing, so stragglers and skew have room.
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("LIEU_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def attach_session(app_name: str) -> SparkSession:
    """getOrCreate for spark-submit entrypoints (jobs/): master, deploy
    mode, and executor sizing come from the submit command; the
    SESSION-level confs build_session tunes are applied post-attach —
    they are runtime-settable and otherwise silently revert to defaults
    (shuffle.partitions=200, machine-local timezone), dropping the
    measured one-wave win and making ts-derived output host-dependent.
    Shuffle partitions are only pinned under a local[N] master — on a
    real cluster they size to input volume / AQE as documented above."""
    spark = SparkSession.builder.appName(app_name).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    if spark.sparkContext.master.startswith("local"):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )
    return spark
