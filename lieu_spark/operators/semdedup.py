"""SemDeDup-style semantic deduplication over embedding columns.

Cluster-then-prune (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): assign
every vector to its nearest k-means centroid (the IVF coarse quantizer
from operators/ann.py), then WITHIN each cluster greedily drop any
member whose cosine to an earlier-ranked member is >= tau. The rank is
(cosine-to-centroid DESC, id ASC) — the most prototypical member of
each semantic-dup group survives and every later near-copy is dropped,
the same greedy sweep as the published recipe, made deterministic by
the id tie-break.

Scale shape (the reason this beats global near-dup search for semantic
dups): the pairwise pass runs per CELL — the join shuffles on ``cell``
and the pair count is sum(|cell|^2), never n^2. K-means balances list
sizes, AQE skew-join splits any hot cell, and ``cell_cap`` (same salted
sub-split used by the MinHash/SimHash blocking paths) bounds the worst
case when the corpus collapses into one cluster. Centroid training is
the bounded driver-side sample from ann.ivf_centroids — O(sample * k),
independent of corpus size — while assignment and pruning stay fully
distributed.

Reference parity note: the reference engine (openvenues/lieu) has no
embedding operators; this module is part of the training-data tier the
task brief adds beyond the reference (dedup family: exact, MinHash,
SimHash, n-gram Jaccard, embedding-LSH, and — here — semantic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_with_norms, dot, norm
from .ann import ivf_centroids

# Default within-cell size guard: cells larger than this are salted into
# sub-groups before the pairwise pass, bounding the per-cell join at
# ~cap^2/2 pairs even when k-means collapses the corpus into one cell.
# Groups at or under the cap get sub = 0 — identical plan and output to
# the uncapped sweep — so the guard costs nothing on balanced cells and
# is ON BY DEFAULT (pass cell_cap=None to opt out explicitly; raise
# ncentroids first if you find yourself doing that).
DEFAULT_CELL_CAP = 4096


def _make_cell_cos_udf(centroids: np.ndarray):
    """pandas UDF: embedding -> [member_cell, cent_cos6] (one matmul per
    Arrow batch, same shape as the ann.py bucketers). cent_cos6 is the
    cosine to the OWN cell's centroid quantized to 1e-6 — the
    cross-engine ordering key for the greedy sweep."""
    from pyspark.sql.types import ArrayType, LongType

    ct = centroids.T.copy()  # (dim, nc)

    @F.pandas_udf(ArrayType(LongType()))
    def cell_cos(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        # null embeddings -> null output row: np.asarray(None) is a 0-d
        # array, so ONE null row used to kill np.stack — and the whole
        # stage — with an opaque shape error; every other operator
        # family hardens nulls at its choke point (KMV filters values,
        # the stateful assembler filters turns), so does this one.
        # Callers treat a null cell as "not assignable" and skip it.
        vals = list(vecs)
        mask = np.array([v is not None for v in vals], dtype=bool)
        out = [None] * len(vals)
        if mask.any():
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v, m in zip(vals, mask) if m]
            )
            nrm = np.linalg.norm(x, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (x / nrm) @ ct  # (n, nc); centroids are unit-norm
            cell = np.argmax(sims, axis=1)
            cos6 = np.round(sims[np.arange(len(x)), cell] * 1e6).astype(np.int64)
            packed = np.stack([cell.astype(np.int64), cos6], axis=1)
            j = 0
            for pos in np.flatnonzero(mask):
                out[pos] = packed[j]
                j += 1
        return pd.Series(out, dtype=object)

    return cell_cos


def semantic_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, cent_cos6): member-cell assignment plus the quantized
    cosine to that cell's centroid. This is the kernel output the oracle
    export channel ships to DuckDB — everything downstream (rank window,
    within-cell pair join, cosine prune) is relational."""
    udf = _make_cell_cos_udf(centroids)
    return (
        embeddings.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
        )
        .withColumn("cc", udf(F.col("vec")))
        # null embedding -> null cc (the UDF's null guard): such a row
        # cannot be assigned to a cell, so it carries no assignment row
        # — downstream keep-flag joins leave it unflagged (kept)
        .filter(F.col("cc").isNotNull())
        .select(
            "id",
            F.col("cc")[0].alias("cell"),
            F.col("cc")[1].alias("cent_cos6"),
        )
    )


def semantic_dedup_flags(
    embeddings: DataFrame,
    assignments: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = DEFAULT_CELL_CAP,
) -> DataFrame:
    """(id, cell, cent_cos6, keep) — greedy within-cell prune.

    Rank members of each cell by (cent_cos6 DESC, id ASC); member i is
    dropped (keep = 0) iff some member ranked BEFORE it has cosine >=
    tau with it — against ALL earlier members, kept or not, which is
    exactly what the published SemDeDup code does (upper-triangular max
    of the within-cluster similarity matrix), and what keeps the sweep
    one relational pass instead of an iterative fixpoint. Rank-1 members
    always survive; every semantic-dup group keeps its most prototypical
    element. ``assignments`` is a (id, cell, cent_cos6) frame from
    ``semantic_cells`` (or read back from the oracle export).

    Physical plan: one shuffle on ``cell`` for the rank window, reused
    by the self-join (same key); the pair set is ordered (rank_earlier <
    rank_later) so each unordered pair is scored once. ``cell_cap``
    (DEFAULT_CELL_CAP by default — the default-safe plan) applies the
    salted sub-split guard from operators/lsh.py to any cell larger
    than the cap — the 100 TB fallback when k-means cannot balance
    (cross-sub dups of a split cell are then missed, same documented
    trade as the LSH bucket cap; raise ncentroids first). Cells at or
    under the cap are byte-identical to the uncapped sweep (sub = 0)."""
    tau6 = int(round(tau * 1e6))
    asg = assignments.select(
        F.col("id").cast("long").alias("id"),
        F.col("cell").cast("long").alias("cell"),
        F.col("cent_cos6").cast("long").alias("cent_cos6"),
    )
    part_keys = ["cell"]
    if cell_cap is not None:
        from .lsh import salted_groups

        asg = salted_groups(asg, ["cell"], cell_cap)
        part_keys = ["cell", "sub"]
    w = Window.partitionBy(*part_keys).orderBy(
        F.col("cent_cos6").desc(), F.col("id").asc()
    )
    # materialized: ranked feeds THREE consumers (lhs, rhs, the final
    # keep-flag join) and its lineage includes the pandas-UDF
    # centroid-cosine pass over every embedding when assignments comes
    # straight from semantic_cells — without this that UDF pass runs
    # once per consumer (exchange reuse does not unify the
    # differently-pruned subtrees). Narrow frame: (id, cell, cent_cos6
    # [, sub], rnk). localCheckpoint, not persist: a persist entry
    # lives in the cache manager until an unpersist nobody here can
    # issue (the returned frame references it), leaking one cached
    # table per call in chained sessions; checkpoint blocks are
    # context-cleaned when the frame is GC'd.
    ranked = asg.withColumn("rnk", F.row_number().over(w)).localCheckpoint(
        eager=False
    )

    # lazy localCheckpoint, same reasoning as `ranked` above: the a/b
    # join sides are differently-aliased consumers (no exchange reuse),
    # so without it the vector scan + O(dim) norm fold ran twice
    base = embeddings.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", norm(F.col("vec"))).localCheckpoint(eager=False)
    lhs = ranked.select(
        *part_keys, F.col("id").alias("id_a"), F.col("rnk").alias("rnk_a")
    )
    rhs = ranked.select(
        *part_keys, F.col("id").alias("id_b"), F.col("rnk").alias("rnk_b")
    )
    pairs = lhs.join(rhs, part_keys).filter(F.col("rnk_a") < F.col("rnk_b"))
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    dropped = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cos6",
            F.round(
                cosine_with_norms(
                    dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a"), F.col("nrm_b")
                )
                * 1e6
            ).cast("long"),
        )
        .filter(F.col("cos6") >= F.lit(tau6))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        ranked.join(dropped.withColumn("dropped", F.lit(1)), "id", "left")
        .select(
            "id",
            "cell",
            "cent_cos6",
            F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    tau: float = 0.95,
    ncentroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = DEFAULT_CELL_CAP,
) -> DataFrame:
    """End-to-end SemDeDup: train the coarse quantizer (bounded driver
    sample), assign cells, greedy within-cell prune (cell_cap guard on
    by default). Returns (id, cell, cent_cos6, keep)."""
    cents = ivf_centroids(
        embeddings, ncentroids=ncentroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    asg = semantic_cells(embeddings, cents, id_col=id_col, vec_col=vec_col)
    return semantic_dedup_flags(
        embeddings, asg, tau=tau, id_col=id_col, vec_col=vec_col, cell_cap=cell_cap
    )
