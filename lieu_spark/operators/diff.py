"""Snapshot diff — CDC between two corpus versions.

Web-scale corpora are rebuilt per crawl/snapshot; the incremental
question is "what changed since the last build" so downstream stages
(re-annotation, re-dedup, re-training-mix) touch only the delta. This
is the batch analog of the streaming index fold in streaming/ingest.py:
two full snapshots in, one per-id verdict out.

Statuses:
  unchanged — id in both, content hash equal
  changed   — id in both, content hash differs
  removed   — id only in old, content absent from the added set
  added     — id only in new, content absent from the removed set
  moved_out — id only in old, but its exact content reappears under a
              new id (the old id of a rename/re-keying)
  moved_in  — id only in new, content identical to a removed old row

Move detection is set-membership on the content hash of the DELTA
sides only (no pairing, so duplicated content is unambiguous), which
keeps it deterministic and cheap: at scale the added/removed sets are
the snapshot delta, orders of magnitude smaller than the corpus.

Scale shape: one full-outer equi-join on the id (shuffle-on-key, AQE
splits skew; ids are unique so there is none), then two left joins on
md5 over the small delta sides — the optimizer broadcasts them when
they fit. No window, no global sort, no UDF.

No lieu analog (the reference dedupes one snapshot at a time); this is
the beyond-reference incremental-corpus operator of SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-id status frame (id_col, status) for two snapshot frames."""
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("__oh"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("__nh"))
    j = o.join(n, id_col, "full_outer")

    removed = j.filter(F.col("__nh").isNull()).select(id_col, "__oh")
    added = j.filter(F.col("__oh").isNull()).select(id_col, "__nh")
    rem_hashes = removed.select(F.col("__oh").alias("__h")).distinct()
    add_hashes = added.select(F.col("__nh").alias("__h")).distinct()

    both = j.filter(F.col("__oh").isNotNull() & F.col("__nh").isNotNull()).select(
        id_col,
        F.when(F.col("__oh") == F.col("__nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
    rem = removed.join(
        add_hashes.withColumn("__m", F.lit(1)),
        removed["__oh"] == add_hashes["__h"],
        "left",
    ).select(
        id_col,
        F.when(F.col("__m") == 1, F.lit("moved_out"))
        .otherwise(F.lit("removed"))
        .alias("status"),
    )
    add = added.join(
        rem_hashes.withColumn("__m", F.lit(1)),
        added["__nh"] == rem_hashes["__h"],
        "left",
    ).select(
        id_col,
        F.when(F.col("__m") == 1, F.lit("moved_in"))
        .otherwise(F.lit("added"))
        .alias("status"),
    )
    return both.unionByName(rem).unionByName(add)
