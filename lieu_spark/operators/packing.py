"""Sequence packing: fill fixed-token-capacity training sequences.

Pretraining pipelines pack documents into fixed-length sequences to
avoid padding waste. This operator implements deterministic NEXT-FIT
packing: documents are sharded by an engine-portable md5 hash, ordered
by id within the shard, and greedily accumulated into bins — a new bin
starts whenever the running fill would exceed ``capacity``. A document
larger than ``capacity`` still gets a bin of its own (callers decide
whether to chunk oversize docs upstream; the packer never drops rows).

Determinism is the point: shard and bin are pure functions of
(doc ids, token counts, capacity, nshards) — independent of partition
layout and engine — so the assignment is resumable, auditable, and
DuckDB-verifiable (the oracle replays the same sweep with a recursive
CTE).

Scale shape: packing is embarrassingly parallel across shards (one
shuffle on ``shard``); the per-shard state is just (id, n_tokens) pairs
— a few bytes per document, so even 10^10 documents over 10^4 shards is
~10^6 tiny rows per task. The per-shard sweep is O(bins * log n) numpy
(searchsorted over the prefix-sum per emitted bin), not a per-row
Python loop: next-fit bin boundaries are exactly the points where the
prefix sum crosses fill+capacity, so each bin is found with one binary
search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sampling import hash_bucket


def _pack_next_fit(n_tok: np.ndarray, capacity: int) -> np.ndarray:
    """Bin index per element for next-fit over ``n_tok`` in given order.

    Vectorized per BIN, not per row: cum[j] is the prefix sum; from a
    bin starting at element i with base fill cum[i-1], the bin extends
    to the last j with cum[j] - cum[i-1] <= capacity (found by
    searchsorted), except an oversize element always occupies its own
    bin (progress guarantee)."""
    n = len(n_tok)
    bins = np.empty(n, dtype=np.int64)
    cum = np.cumsum(n_tok, dtype=np.int64)
    i, b = 0, 0
    while i < n:
        base = cum[i - 1] if i > 0 else 0
        j = int(np.searchsorted(cum, base + capacity, side="right"))
        j = max(j, i + 1)  # oversize element: own bin, still advances
        bins[i:j] = b
        i, b = j, b + 1
    return bins


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    nshards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *group_cols, shard, seq, n_tokens): next-fit packing of
    ``docs`` into fixed-capacity sequences. ``seq`` is the bin index
    within (*group_cols, shard); (*group_cols, shard, seq) identifies a
    training sequence globally. ``group_cols`` (e.g. ``("split",)``)
    hard-partitions the packing so a sequence never mixes rows across a
    boundary — the train/test wall a packer must respect. Input rows
    with the same id land in the same shard by construction; ordering
    within a group is by id, so the output is partition-layout-
    independent."""
    gcols = list(group_cols)
    # string ids pass through as strings (chunk/unit ids like
    # "doc:000003"); anything else keeps the legacy cast-to-long
    # contract. Ordering within a shard is then lexicographic — still a
    # pure function of the id set, which is all determinism needs.
    id_type = docs.schema[id_col].dataType.simpleString()
    id_out = "string" if id_type == "string" else "long"
    schema = f"doc_id {id_out}, shard int, seq long, n_tokens long"
    if gcols:
        gschema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in docs.select(*gcols).schema.fields
        )
        schema = f"doc_id {id_out}, {gschema}, shard int, seq long, n_tokens long"
    base = docs.select(
        F.col(id_col).cast(id_out).alias("doc_id"),
        *gcols,
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn(
        "shard",
        F.pmod(hash_bucket(F.col("doc_id"), salt="pack"), F.lit(nshards)).cast("int"),
    )
    out_cols = ["doc_id", *gcols, "shard", "seq", "n_tokens"]
    # explicit hash repartition on the exact grouping keys: the rows are
    # a few bytes each, so AQE's byte-based coalescing would otherwise
    # merge the groupBy exchange into one or two tasks and serialize the
    # per-shard sweeps (CLAUDE.md rule: repartition before pandas
    # stages). The user-specified repartition satisfies the group
    # distribution, so no second exchange is inserted and AQE leaves the
    # partition count alone.
    sc = base.sparkSession.sparkContext
    base = base.repartition(max(sc.defaultParallelism, 8), *gcols, "shard")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # n_tokens as the secondary key: with doc_id alone, duplicate
        # ids would tie and mergesort's stability would resolve them by
        # ARRIVAL order — partition-layout-dependent seq assignment,
        # breaking the "pure function of (ids, counts)" contract. With
        # both keys, equal rows are interchangeable, so the packing is
        # layout-independent even for duplicated ids.
        pdf = pdf.sort_values(["doc_id", "n_tokens"], kind="mergesort").reset_index(
            drop=True
        )
        pdf["seq"] = _pack_next_fit(
            pdf["n_tokens"].to_numpy(dtype=np.int64), capacity
        )
        return pdf[out_cols]

    return base.groupBy(*gcols, "shard").applyInPandas(pack, schema)


def packing_stats(
    packed: DataFrame, capacity: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-(*group_cols, shard, seq) audit: fill, doc count, utilization
    — the waste metric a packing change is judged by."""
    return (
        packed.groupBy(*group_cols, "shard", "seq")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("fill"),
        )
        .withColumn(
            "util6",
            F.round(
                F.least(F.col("fill"), F.lit(capacity)).cast("double")
                / F.lit(float(capacity))
                * 1e6
            ).cast("long"),
        )
    )
