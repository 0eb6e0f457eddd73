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


def _diff_join(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The two-snapshot full-outer equi-join on the id, pre-checkpoint
    (split out so the plan shape stays assertable — the checkpoint in
    snapshot_diff replaces the visible plan with the materialized RDD)."""
    o = old.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__oh"),
        F.lit(1).alias("__op"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__nh"),
        F.lit(1).alias("__np"),
    )
    return o.join(n, id_col, "full_outer")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-id status frame (id_col, status) for two snapshot frames.

    Presence is tracked with explicit per-side marker columns, NEVER
    hash nullness: md5(NULL text) is NULL, so an id present in both
    snapshots with NULL text on one side would otherwise be
    misclassified (and an old-only NULL-text row would satisfy BOTH
    delta filters, emitting two contradictory status rows for one id).
    NULL text hashes as '' — the same null-text convention assembly
    uses at its choke point."""
    # the corpus-scale full-outer join feeds five differently-pruned
    # consumers (both / removed / added / the two delta hash sets) —
    # pruning defeats exchange reuse (CLAUDE.md), so materialize it
    # once; localCheckpoint blocks are context-cleaned on GC
    j = _diff_join(old, new, id_col, text_col).localCheckpoint(eager=False)

    removed = j.filter(F.col("__np").isNull()).select(id_col, "__oh")
    added = j.filter(F.col("__op").isNull()).select(id_col, "__nh")
    rem_hashes = removed.select(F.col("__oh").alias("__h")).distinct()
    add_hashes = added.select(F.col("__nh").alias("__h")).distinct()

    both = j.filter(F.col("__op").isNotNull() & F.col("__np").isNotNull()).select(
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
