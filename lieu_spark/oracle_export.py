"""Oracle export side-channel: materialize kernel outputs for DuckDB.

The engine's hash kernels (xxhash64 banding, OPH MinHash, SimHash bit
packing, hyperplane bucketing) are not reproducible in DuckDB, which
used to leave their downstream queries in the weaker rows-only driver
tier. This module closes that gap: a driver query writes the kernel's
OUTPUT table (band keys / simhash values / winnow fingerprints / LSH
buckets — all bounded, a few rows per doc) to a parquet, then builds its
own result by READING THAT PARQUET BACK, and the DuckDB oracle reads the
same file with ``read_parquet``. The relational half of each path —
grouping, collision self-joins, pair generation, re-ranking — is then
value-hash-verified end to end; only the numpy/JVM kernels themselves
remain pytest-verified (bit-equality against the pure-python oracle in
tests/).

Consistency: the Spark result is derived from the exported bytes, so
spark-vs-oracle can never diverge through export staleness as long as
the Spark query runs first (both the driver harness and the pytest
mimics call the queries() entry before executing the oracle SQL).
Writes are idempotent — the exports are deterministic functions of
(input tables, DedupeConfig) — and tiny (<= a few rows per document),
so each call simply overwrites.

This is an oracle-enablement channel, NOT a production path: production
pipelines checkpoint through lieu_spark.pipeline's stage store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Override with $SPARK_GRAFT_EXPORT_DIR (set BEFORE importing
# lieu_spark.oracle_sql — the oracle SQL strings interpolate these paths
# at import time) when two processes would otherwise share exports, e.g.
# a bench run concurrent with the oracle pytest suite at a different SF:
# an overwrite from one process deletes the files the other's DuckDB
# scan is reading. Within one process, query-before-oracle ordering
# (which both the driver harness and the pytest mimics follow) keeps
# the shared default consistent.
EXPORT_DIR = os.environ.get("SPARK_GRAFT_EXPORT_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".oracle_cache",
    "export",
)


def export_path(name: str) -> str:
    return os.path.join(EXPORT_DIR, f"{name}.parquet")


def export_for_oracle(
    spark: SparkSession, df: DataFrame, name: str, single_file: bool = True
) -> DataFrame:
    """Write ``df`` to the shared export location and return a frame
    reading it back (single file by default: most exports are bounded
    metadata tables — a few rows per document — and one file keeps the
    listing trivial). The DuckDB side reads ``{name}.parquet/*.parquet``
    either way, so the handful of exports that are NOT bounded per doc
    (per-token tables, full doc texts) pass ``single_file=False`` and
    keep their write parallel instead of funneling the sort/serialize
    through one task."""
    path = export_path(name)
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
