"""Mergeable sketch aggregates: KMV (bottom-k) distinct-count and
Count-Min frequency estimation, as pure DataFrame plans.

The reference engine counts exactly (lib/lieu has no sketch surface);
at 100 TB an exact per-group count-distinct or heavy-hitter groupBy is
often the bottleneck, and the sketch versions are the standard remedy:
a KMV synopsis is k longs per group (mergeable by "union then keep the
k smallest"), a CMS is a fixed depth x width grid of counters
(mergeable by elementwise add), so both survive arbitrary re-sharding.

Cross-engine determinism: both sketches hash through the same
engine-portable md5 grid as functions/sampling.hash_bucket, so every
estimate is a deterministic function of the input and a DuckDB oracle
re-derives it exactly — the error is real sketch error, but it is
reproducible, never a random variable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_BITS = 40
KMV_MAX = 1 << KMV_BITS  # hash domain size (fits long arithmetic at k<=2^22)


def kmv_hash(col: Column) -> Column:
    """Uniform hash in [1, 2^40] from md5 (engine-portable; the +1 keeps
    the divisor in the estimator strictly positive under ANSI mode)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 10), 16, 10)
    return h.cast("long") + F.lit(1)


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group KMV distinct-count sketch (Bar-Yossef et al. 2002): keep
    the k smallest distinct hash values; if fewer than k distinct values
    exist the count is exact, else estimate (k-1) * M / h_k where h_k is
    the k-th smallest hash over domain M = 2^40.

    Output: group_cols + (n_exact, kth_min, kmv_estimate) — n_exact rides
    along as the verification column (it falls out of the same ranked
    frame for free; a production caller at 100 TB would drop it and skip
    the count).

    Plan shape: one distinct on (group, hash) then a per-group window
    rank over the DISTINCT hash stream — the same single exchange an
    exact count-distinct needs, external-sortable, no per-group state in
    memory. The sketch's scale win is the k-long mergeable synopsis this
    emits (partial sketches from shards union + re-rank in O(shards * k)),
    not the first build.
    """
    gcols = list(group_cols)
    hashes = df.select(*gcols, kmv_hash(F.col(value_col)).alias("hv")).distinct()
    w = Window.partitionBy(*gcols).orderBy("hv")
    ranked = hashes.select(
        *gcols,
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(*gcols)).alias("nd"),
    )
    per_group = (
        ranked.filter(
            (F.col("rn") <= F.lit(k)) & (F.col("rn") == F.least(F.col("nd"), F.lit(k)))
        )
        .select(*gcols, F.col("nd").alias("n_exact"), F.col("hv").alias("kth_min"))
    )
    est = F.when(
        F.col("n_exact") < F.lit(k), F.col("n_exact")
    ).otherwise(F.expr(f"{(k - 1) * KMV_MAX} div kth_min"))
    return per_group.withColumn("kmv_estimate", est.cast("long"))


def cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Counter index for CMS row ``row`` — md5 over the row-salted key,
    mod width (same construction both engines evaluate exactly)."""
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), key))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width))


def cms_table(
    counts: DataFrame,
    key_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch grid (Cormode & Muthukrishnan 2005) built FROM an
    exact per-key count frame: each key's count lands in one counter per
    row, counters sum keys that collide. depth x width rows total —
    a broadcastable synopsis regardless of key cardinality.

    Building from the counts frame (not the raw stream) costs one corpus
    pass total when the caller already aggregates counts; on a raw
    stream at scale you'd groupBy (row, bucket) directly — same plan,
    depth x width reducers, no per-key state.
    """
    rows = counts.withColumn(
        "cms_row", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    )
    return (
        rows.withColumn(
            "cms_bucket", cms_bucket(F.col(key_col), F.col("cms_row"), width)
        )
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum(count_col).cast("long").alias("cms_count"))
    )


def cms_lookup(
    keys: DataFrame,
    cms: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key against a CMS grid: min over the depth
    counters the key hashes to. The grid is broadcast (≤ depth * width
    rows by construction), so lookup is a map-side join — no shuffle of
    the keys side."""
    probes = keys.withColumn(
        "cms_row", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ).withColumn("cms_bucket", cms_bucket(F.col(key_col), F.col("cms_row"), width))
    others = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(cms), ["cms_row", "cms_bucket"])
        .groupBy(*others)
        .agg(F.min("cms_count").alias("cms_est"))
    )
