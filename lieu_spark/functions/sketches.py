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


def _require_k(k: int) -> None:
    """k >= 2 across the KMV/theta family. k=1 is silently degenerate:
    kmv_distinct's exact branch (n_exact < k) never fires so every
    group estimates (k-1)*M div h = 0, and a k=1 theta sketch retains
    NO hashes ({h < theta=h_1} is empty) so the group vanishes from
    theta_pair_ops with no error."""
    if k < 2:
        raise ValueError(f"sketch k must be >= 2, got {k}")


def _distinct_hashes(df: DataFrame, gcols: list, value_col: str) -> DataFrame:
    """The shared KMV front end: distinct (group, hv) pairs with NULL
    values dropped BEFORE ranking (NULL hashes to NULL, which Spark
    windows rank FIRST asc while SQL engines default NULLS LAST — the
    cross-engine divergence the whole family filters against)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*gcols, kmv_hash(F.col(value_col)).alias("hv"))
        .distinct()
    )


def _bottom_k_stats(
    hashes: DataFrame, gcols: list, k: int, n_name: str
) -> DataFrame:
    """Shared bottom-k boundary row per group over a distinct
    (group, hv) frame: group_cols + (<n_name>, kth_min, kmv_estimate)
    with the exact-below-k branch. ONE copy of the boundary filter and
    the (k-1)*M div h_k estimator — kmv_distinct and kmv_merge must
    stay in lockstep (a fix applied to one silently missing the other
    is exactly the drift this helper exists to prevent)."""
    w = Window.partitionBy(*gcols).orderBy("hv")
    ranked = hashes.select(
        *gcols,
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(*gcols)).alias("nd"),
    )
    per_group = ranked.filter(
        (F.col("rn") <= F.lit(k)) & (F.col("rn") == F.least(F.col("nd"), F.lit(k)))
    ).select(*gcols, F.col("nd").alias(n_name), F.col("hv").alias("kth_min"))
    est = F.when(
        F.col(n_name) < F.lit(k), F.col(n_name)
    ).otherwise(F.expr(f"{(k - 1) * KMV_MAX} div kth_min"))
    return per_group.withColumn("kmv_estimate", est.cast("long"))


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
    the count). n_exact counts distinct values ON THE 40-BIT HASH GRID:
    it equals the true distinct-value count only while collisions are
    negligible (birthday bound ~1.5M distinct values per group); past
    that it undercounts — treat it as a grid diagnostic, not as truth
    against an independent COUNT(DISTINCT value).

    Plan shape: one distinct on (group, hash) then a per-group window
    rank over the DISTINCT hash stream — the same single exchange an
    exact count-distinct needs, external-sortable, no per-group state in
    memory. The sketch's scale win is the k-long mergeable synopsis this
    emits (partial sketches from shards union + re-rank in O(shards * k)),
    not the first build.
    """
    _require_k(k)
    gcols = list(group_cols)
    return _bottom_k_stats(_distinct_hashes(df, gcols, value_col), gcols, k, "n_exact")


def kmv_synopses(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """The mergeable KMV synopsis itself: one row per retained hash —
    the k smallest distinct hash values per group (group_cols + hv).
    This is what a 100 TB deployment materializes per shard/day: O(k)
    rows per group regardless of group size, rolled up later with
    kmv_merge without touching the raw stream again."""
    _require_k(k)
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("hv")
    return (
        _distinct_hashes(df, gcols, value_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.lit(k))
        .select(*gcols, "hv")
    )


def kmv_merge(
    synopses: DataFrame,
    group_cols: Sequence[str],
    k: int = 32,
) -> DataFrame:
    """Roll child KMV synopses up to a coarser grouping: union the
    retained hashes, distinct, re-rank, keep the bottom k. LOSSLESS by
    construction — any hash with global rank r <= k has rank <= r inside
    its own child group, so it was retained there; the merged bottom-k
    therefore equals the bottom-k of the raw stream and the rollup
    estimate equals the direct estimate exactly. Cost is O(children * k)
    rows, never a second corpus pass. Output matches kmv_distinct's
    shape with n_exact replaced by n_syn (the merged-union distinct
    count — equal to the true distinct count only when no child
    truncated, which is exactly the n_syn < k exact branch).

    k must be <= the k the child synopses were built with: merging at a
    LARGER k reads union ranks the truncated children never retained,
    biasing the estimate low while still claiming losslessness."""
    _require_k(k)
    gcols = list(group_cols)
    u = synopses.select(*gcols, "hv").distinct()
    return _bottom_k_stats(u, gcols, k, "n_syn")


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
    the keys side. LEFT join + coalesce-to-0: the grid is sparse
    (cms_table's groupBy never materializes untouched counters), so a
    probe key absent from the build set must read its empty buckets as
    0 — an inner join would silently drop the key (all its buckets
    empty) or inflate the min (only some empty), breaking
    membership-style probes of non-build keys."""
    probes = keys.withColumn(
        "cms_row", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ).withColumn("cms_bucket", cms_bucket(F.col(key_col), F.col("cms_row"), width))
    others = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(cms), ["cms_row", "cms_bucket"], "left")
        .groupBy(*others)
        .agg(
            F.min(F.coalesce("cms_count", F.lit(0).cast("long"))).alias("cms_est")
        )
    )


def theta_sketches(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group theta sketch (the KMV synopsis with its threshold made
    explicit — Dasgupta et al. 2016): retained hashes are {h < theta}
    where theta = the k-th smallest hash (or domain+1 when the group has
    fewer than k distinct values, i.e. the sketch is exact). Output one
    row per retained hash: (group, hv, theta, n_exact). Set-operation
    estimates between groups then run entirely on these synopses —
    O(k) rows per group regardless of group size."""
    _require_k(k)
    hashes = _distinct_hashes(df, [group_col], value_col)
    w = Window.partitionBy(group_col).orderBy("hv")
    ranked = hashes.select(
        group_col,
        "hv",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n_exact"),
    ).filter(F.col("rn") <= F.lit(k))
    theta = F.when(
        F.col("n_exact") >= F.lit(k),
        F.max(F.when(F.col("rn") == F.lit(k), F.col("hv"))).over(
            Window.partitionBy(group_col)
        ),
    ).otherwise(F.lit(KMV_MAX + 1))
    return (
        ranked.withColumn("theta", theta.cast("long"))
        .filter(F.col("hv") < F.col("theta"))
        .select(group_col, "hv", "theta", "n_exact")
    )


def theta_pair_ops(sketches: DataFrame, group_col: str) -> DataFrame:
    """Pairwise union/intersection estimates between every two groups'
    theta sketches: for a pair, theta = min of the two thresholds, both
    retained sets are cut back to {h < theta}, and |S| * M div theta
    estimates the true cardinality (exact when both sketches are exact,
    theta = M+1). Quadratic in #groups (audience-overlap workloads have
    few segments); every join side is a k-row synopsis."""
    g = group_col
    # The synopsis frame is O(groups * k) rows but its UPSTREAM build
    # (theta_sketches: corpus scan + distinct + window) is not — and the
    # differently-pruned consumers below (th -> pairs -> na/nb/ni, plus
    # ra twice, rb, rb2) defeat Catalyst exchange reuse (CLAUDE.md), so
    # without materialization the corpus-scale build re-executes per
    # consumer. localCheckpoint, not persist: the blocks are
    # context-cleaned when the frame is GC'd, so chained sessions don't
    # leak a cache entry per call.
    sketches = sketches.localCheckpoint(eager=False)
    th = sketches.select(g, "theta", "n_exact").distinct()
    pairs = (
        th.select(
            F.col(g).alias("grp_a"),
            F.col("theta").alias("th_a"),
            F.col("n_exact").alias("nd_a"),
        )
        .join(
            th.select(
                F.col(g).alias("grp_b"),
                F.col("theta").alias("th_b"),
                F.col("n_exact").alias("nd_b"),
            ),
            F.col("grp_a") < F.col("grp_b"),
        )
        .withColumn("th", F.least("th_a", "th_b"))
    )
    ra = sketches.select(F.col(g).alias("grp_a"), "hv")
    rb = sketches.select(F.col(g).alias("grp_b"), F.col("hv").alias("hv_b"))
    na = (
        pairs.join(F.broadcast(ra), "grp_a")
        .filter(F.col("hv") < F.col("th"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("ka"))
    )
    nb = (
        pairs.join(F.broadcast(rb), "grp_b")
        .filter(F.col("hv_b") < F.col("th"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("kb"))
    )
    rb2 = rb.withColumnRenamed("grp_b", "grp_b2")
    ni = (
        pairs.join(F.broadcast(ra), "grp_a")
        .join(
            F.broadcast(rb2),
            (F.col("grp_b") == F.col("grp_b2")) & (F.col("hv") == F.col("hv_b")),
        )
        .filter(F.col("hv") < F.col("th"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count("*").alias("ki"))
    )
    # pairs is the spine: a side with NO retained hash below the pair
    # threshold (exact tiny sketch paired with a huge one — its smallest
    # hash can exceed the other's theta) must yield ka=0, not a silently
    # dropped output row
    est = (
        pairs.join(na, ["grp_a", "grp_b"], "left")
        .join(nb, ["grp_a", "grp_b"], "left")
        .join(ni, ["grp_a", "grp_b"], "left")
        .withColumn("ka", F.coalesce("ka", F.lit(0)))
        .withColumn("kb", F.coalesce("kb", F.lit(0)))
        .withColumn("ki", F.coalesce("ki", F.lit(0)))
    )
    # integer form: |S| * M div theta (exact when theta beyond domain)
    union_s = F.col("ka") + F.col("kb") - F.col("ki")
    return est.select(
        "grp_a",
        "grp_b",
        "nd_a",
        "nd_b",
        F.when(F.col("th") > F.lit(KMV_MAX), union_s)
        .otherwise(F.expr(f"({KMV_MAX}L * (ka + kb - ki)) div th"))
        .cast("long")
        .alias("theta_union_est"),
        F.when(F.col("th") > F.lit(KMV_MAX), F.col("ki"))
        .otherwise(F.expr(f"({KMV_MAX}L * ki) div th"))
        .cast("long")
        .alias("theta_inter_est"),
    )


def histogram_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    pcts: Sequence[int] = (50, 90, 99),
    nbuckets: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles from a fixed-width histogram —
    the one-pass synopsis for percentile monitoring at scale: the
    histogram is nbuckets counters per group (mergeable by add), the
    quantile is read off the cumulative counts with linear interpolation
    inside the boundary bucket. All integer arithmetic on an integer
    value column (use cents/micros upstream); target rank for pct p is
    ceil(n * p / 100). Output: group + (pct, n, est) — callers wanting
    an error column join the exact rank-k value alongside (the exact
    path needs the per-group sort this sketch avoids)."""
    gcols = list(group_cols)
    # NULL values bucket to NULL, which Spark's cumulative window ranks
    # FIRST (asc nulls-first) while SQL engines default NULLS LAST —
    # the same cross-engine divergence kmv_distinct/theta_sketches
    # filter against — and count(*) would include them in n. Drop them:
    # quantiles are over present values.
    src = df.filter(F.col(value_col).isNotNull())
    stats = src.groupBy(*gcols).agg(
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.count("*").alias("n"),
    )
    # no broadcast hint: stats is one row per GROUP, unbounded for
    # high-cardinality groupings — let AQE pick broadcast when small
    # instead of forcing a driver-OOM-able build side.
    # eqNullSafe keys: a NULL group gets a stats row from groupBy, and
    # a plain equi-join would silently drop every one of its rows on
    # the way back — the NULL group must emit quantiles like any other
    # (matching kmv_distinct/theta_sketches, which keep NULL groups);
    # EqualNullSafe is still a hash-partitionable equi-join key.
    s_src, s_st = src.alias("__hq_src"), stats.alias("__hq_st")
    jcond = None
    for c in gcols:
        t = F.col(f"__hq_src.{c}").eqNullSafe(F.col(f"__hq_st.{c}"))
        jcond = t if jcond is None else (jcond & t)
    withb = (
        s_src.join(s_st, jcond)
        .select(
            *[F.col(f"__hq_src.{c}") for c in src.columns],
            F.col("__hq_st.vmin"),
            F.col("__hq_st.vmax"),
            F.col("__hq_st.n"),
        )
        .withColumn(
            "width",
            F.greatest(F.expr("(vmax - vmin) div " + str(nbuckets)) + 1, F.lit(1)),
        )
        .withColumn("bucket", F.expr(f"({value_col} - vmin) div width"))
    )
    hist = withb.groupBy(*gcols, "vmin", "width", "n", "bucket").agg(
        F.count("*").alias("bn")
    )
    wcum = Window.partitionBy(*gcols).orderBy("bucket")
    cum = hist.withColumn("cum", F.sum("bn").over(wcum))
    probes = cum.withColumn(
        "pct", F.explode(F.array(*[F.lit(int(p)) for p in pcts]))
    ).withColumn("target", F.expr("(n * pct + 99) div 100"))
    hit = probes.filter(F.col("cum") >= F.col("target"))
    first = hit.groupBy(*gcols, "pct").agg(
        F.min_by(
            F.struct("bucket", "bn", "cum", "vmin", "width", "n", "target"), F.col("bucket")
        ).alias("s")
    )
    return first.select(
        *gcols,
        "pct",
        F.col("s.n").alias("n"),
        (
            # in-bucket offset 1..bn maps onto [lo, lo+width) — offset-1
            # keeps the last rank inside the bucket (a constant column
            # must estimate to the constant, not the exclusive edge)
            F.col("s.vmin")
            + F.col("s.bucket") * F.col("s.width")
            + F.expr("((s.target - (s.cum - s.bn) - 1) * s.width) div s.bn")
        ).cast("long").alias("est"),
    )
