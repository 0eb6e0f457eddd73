"""Deterministic hash sampling and train/val/test split assignment.

Training-data pipelines need splits and samples that are (a) stable
under reshuffles, backfills, and cluster-size changes, (b) reproducible
from the row's identity alone — never ``rand()``, whose output depends
on partitioning and task retry order. The standard recipe: hash the id
with a salt, quantize to a bucket in [0, 1e6), and threshold.

The hash is md5 (not xxhash64) deliberately: md5 is bit-identical
across Spark, DuckDB, and every other engine that might re-derive the
assignment downstream, so the split is portable — a row's membership
can be audited with one line of SQL anywhere. 15 hex chars = 60 bits,
uniform mod 1e6 to within 2^-40 bias.

Salting: a new ``salt`` gives an independent re-split (e.g. per
experiment); the same salt always reproduces the same assignment.
Everything here is a pure Catalyst expression — whole-stage codegen,
no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt || id) — engine-portable
    (DuckDB twin: CAST(concat('0x', substr(md5(...), 1, 15)) AS BIGINT) %
    1000000)."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(BUCKETS)
    )


def split_assign(
    id_col: Column,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> Column:
    """Split label from cumulative weight thresholds over the hash
    bucket. ``weights`` map label -> fraction (must sum to ~1); dict
    order defines the threshold order, so iterate deterministically."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for label, frac in labels[:-1]:
        cum += frac
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = labels[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(F.lit(last))).alias("split")


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    id_col: str,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic data mixing: downsample each group (language,
    source, domain, ...) to its target rate — the mixture-weighting step
    of corpus assembly. A row of group g survives iff
    hash_bucket(id, salt) < rate_g * 1e6, so membership is stable across
    runs, partitionings, and engines, supersampling holds per group
    (raising one group's rate only ADDS rows), and the whole thing is
    one pure-Catalyst filter — no rand(), no shuffle, pushes down to the
    scan. Groups absent from ``rates`` get ``default_rate``; a NULL
    group value never equals any key, so NULL-group rows also fall to
    ``default_rate``."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = F.lit(int(round(default_rate * BUCKETS)))
    for g, r in sorted(rates.items()):
        threshold = F.when(
            F.col(group_col) == g, F.lit(int(round(r * BUCKETS)))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def soft_dedup_weights(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    salt: str = "soft",
) -> DataFrame:
    """Duplicate-aware soft dedup (SoftDeDup-style reweighting, He et
    al. 2024): instead of hard-dropping duplicates, every member of a
    dup cluster gets sampling weight 1/cluster_size — the cluster's
    total expected mass stays one document, but WHICH member survives is
    an unbiased deterministic draw, so no systematic min-id/first-crawl
    bias and the weights can also be consumed directly as loss weights.

    Adds (csize, weight_ppm, kept): weight_ppm = 1e6 div csize on the
    portable md5 grid, plus one extra ppm for the (1e6 mod csize)
    lowest-id members so the cluster mass is EXACTLY 1e6 for every
    cluster size (plain integer division leaves csize=3 at 999,999);
    kept = hash_bucket(id, salt) < weight_ppm, so the expected number
    of survivors per cluster is exactly one. Singletons get weight 1e6
    and are always kept. One hash exchange on the cluster key (the
    ranked window shares the csize window's partitioning — no second
    exchange, just a within-partition sort); everything else is pure
    Catalyst, so the plan survives any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col)
    wr = Window.partitionBy(cluster_col).orderBy(id_col)
    sized = df.withColumn("csize", F.count("*").over(w).cast("long")).withColumn(
        "__crank", F.row_number().over(wr)
    )
    weight = F.expr(f"{BUCKETS} div csize") + (
        F.col("__crank") <= F.expr(f"{BUCKETS} % csize")
    ).cast("long")
    return (
        sized.withColumn("weight_ppm", weight)
        .withColumn(
            "kept",
            (hash_bucket(F.col(id_col), salt) < F.col("weight_ppm")).cast("int"),
        )
        .drop("__crank")
    )


def corpus_shuffle(
    df: DataFrame, id_col: str, salt: str = "", nshards: int = 64
) -> DataFrame:
    """Deterministic training-order shuffle: assign every row a stable
    random-looking position — the "shuffle the corpus before training"
    step, without ``rand()`` or a global sort.

    Each row gets ``shard`` (md5 bucket mod ``nshards``) and ``pos``
    (its rank within the shard under the full md5 hex of salt||id,
    doc id as tiebreak). The canonical order is lexicographic
    ``(shard, pos)``: write shard-partitioned files each internally
    ordered by ``pos`` and a sequential reader sees the reproducible
    permutation; a new ``salt`` is an independent reshuffle, the same
    salt always replays the same order, and inserting new rows never
    reorders existing ones relative to each other (sort stability).

    Scale shape: ONE hash shuffle on ``shard`` then a per-shard sort —
    no global range partition, no driver state. Size ``nshards`` to the
    cluster (one output file per shard) so each shard sorts locally;
    the window is partitioned, never a single-partition rank. md5 keeps
    it engine-portable — DuckDB re-derives every (shard, pos) from
    scratch in the oracle."""
    if nshards < 1:
        raise ValueError(f"nshards must be >= 1, got {nshards}")
    okey = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(hash_bucket(F.col(id_col), salt), F.lit(nshards)).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("__okey", id_col)
    return (
        df.withColumn("__okey", okey)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__okey")
    )


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, cap: int, salt: str = ""
) -> DataFrame:
    """Exact deterministic per-group cap — the domain-cap step of
    web-scale curation (RefinedWeb/FineWeb keep at most N pages per
    registered domain so no single crawl host dominates the corpus).
    Keeps, for every group, the ``cap`` rows that come first under the
    stable order ``(hash_bucket(id, salt), id)`` — so membership is
    reproducible across runs, partitionings, and engines, and the kept
    set at cap k1 < k2 is a subset of the kept set at k2 (nested caps
    for free, same salt).

    Scale shape — NOT a per-group global rank. Ranking a billion-row
    hot domain to keep 10k rows would sort the whole domain; instead:

      1. per-(group, bucket) counts — map-side combinable agg, at most
         1e6 rows per group regardless of group size;
      2. cumulative count over the TINY counts table finds the boundary
         bucket b* where the group crosses ``cap``;
      3. rows in buckets < b* are kept with NO sort at all; only the
         boundary bucket itself (~group_size/1e6 rows) is ranked by id.

    So the expensive total order touches ~cap + group/1e6 rows per
    group, never the group. Groups at/below ``cap`` never join a
    boundary row and pass through whole. Group identity is compared
    null-safely (a NULL group is its own capped group, matching SQL
    ``PARTITION BY``). ``id_col`` values must be unique (as everywhere
    in this module) — duplicate ids tie inside the boundary bucket and
    the winner would be partition-order-dependent."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    from pyspark.sql import Window

    dfb = df.withColumn("__b", hash_bucket(F.col(id_col), salt)).withColumn(
        "__g", F.struct(F.col(group_col))
    )
    cnts = dfb.groupBy("__g", "__b").agg(F.count("*").alias("__c"))
    cum = cnts.withColumn(
        "__cum", F.sum("__c").over(Window.partitionBy("__g").orderBy("__b"))
    )
    # first bucket where the running count reaches cap (absent if the
    # whole group fits): rows strictly below it are all kept, and
    # cap - (rows before it) slots remain inside it.
    bound = (
        cum.filter(F.col("__cum") >= cap)
        .groupBy("__g")
        .agg(
            F.min("__b").alias("__bstar"),
            F.min_by(F.lit(cap) - (F.col("__cum") - F.col("__c")), "__b").alias(
                "__rem"
            ),
        )
    )
    joined = dfb.join(bound, "__g", "left")
    keep_cols = [F.col(c) for c in df.columns]
    below = joined.filter(
        F.col("__bstar").isNull() | (F.col("__b") < F.col("__bstar"))
    ).select(*keep_cols)
    at = (
        joined.filter(F.col("__b") == F.col("__bstar"))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("__g", "__b").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("__r") <= F.col("__rem"))
        .select(*keep_cols)
    )
    return below.unionByName(at)


def global_cap(
    df: DataFrame, id_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly ``k`` rows from the whole corpus, deterministically —
    ``cap_per_group`` with one constant group (same boundary-bucket
    machinery: no global sort, only ~k + n/1e6 rows are ever ranked).
    Use instead of ``deterministic_sample`` when the contract is a
    COUNT ("exactly 10k eval docs"), not a rate; nested: the k1 < k2
    sample is a prefix of the k2 sample (same salt)."""
    tagged = df.withColumn("__const", F.lit(0))
    return cap_per_group(tagged, "__const", id_col, k, salt).drop("__const")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture sampling (the mC4 / XLM-R recipe,
    Conneau et al. 2020 §3.1): derive each group's keep-rate from the
    corpus itself so the sampled mixture follows ``p_g^alpha``
    (renormalized) instead of the raw proportions ``p_g`` — alpha < 1
    upsamples rare groups (languages, sources) relative to dominant
    ones, alpha = 1 is plain proportional sampling, alpha = 0 targets
    equal counts per group. ``target_frac`` sets the expected overall
    kept fraction; per-group rates are clamped to 1 in one shot (the
    standard single-pass formula — mass a clamped group cannot absorb
    is NOT redistributed; run with a smaller target_frac if exactness
    there matters). Membership is the usual portable md5-bucket
    threshold, so the sample is deterministic and nested in
    ``target_frac``.

    Fully distributed — unlike ``mixture_sample`` (explicit rate dict)
    there is NO driver-side rate computation: per-group counts are one
    map-side-combinable agg, the corpus totals are a lazy broadcast
    1-row agg (no action during plan construction), and the per-group
    threshold joins back via broadcast (group cardinality must be small
    enough to broadcast — languages/sources, not URLs).

    Engine-portable exactness: the rate chain avoids order-dependent
    double sums. ``p_g^alpha`` is quantized per group FIRST
    (``s_g = round(n_g^alpha * 1e9)`` — for the default alpha = 0.5 the
    power is computed with sqrt, which IEEE-754 guarantees correctly
    rounded, so both engines get the identical long; the shared
    ``1/N^alpha`` factor cancels in the ratio and is never computed),
    the normalizer ``S = sum(s_g)`` is an exact INTEGER sum, and the
    final rate ``target_frac * N / n_g * s_g / S`` is evaluated in that
    exact association order on exact inputs — bit-identical in any
    IEEE engine. For alpha not in {0, 0.5, 1}, pow() is not guaranteed
    correctly rounded and cross-engine bit-parity of the quantized s_g
    is merely overwhelmingly likely, not certain."""
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError(f"target_frac must be in [0, 1], got {target_frac}")
    if alpha < 0.0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    nd = F.col("__n").cast("double")
    if alpha == 0.5:
        powed = F.sqrt(nd)
    elif alpha == 0.0:
        powed = F.lit(1.0)
    elif alpha == 1.0:
        powed = nd
    else:
        powed = F.pow(nd, F.lit(float(alpha)))
    cnts = (
        df.select(F.struct(F.col(group_col)).alias("__g"))
        .groupBy("__g")
        .agg(F.count("*").alias("__n"))
        .withColumn("__s", F.round(powed * 1e9).cast("long"))
    )
    # names must not collide case-insensitively with __n/__s — Spark's
    # default resolver treats __N == __n.
    tot = cnts.agg(
        F.sum("__n").alias("__ntot"), F.sum("__s").alias("__stot")
    )
    rate = (
        F.lit(float(target_frac))
        * F.col("__ntot").cast("double")
        / F.col("__n").cast("double")
        * F.col("__s").cast("double")
        / F.col("__stot").cast("double")
    )
    rates = (
        cnts.join(F.broadcast(tot), how="cross")
        .withColumn(
            "__thr", F.round(F.least(F.lit(1.0), rate) * BUCKETS).cast("long")
        )
        .select("__g", "__thr")
    )
    kept = (
        df.withColumn("__g", F.struct(F.col(group_col)))
        .join(F.broadcast(rates), "__g")
        .filter(hash_bucket(F.col(id_col), salt) < F.col("__thr"))
        .drop("__g", "__thr")
    )
    return kept


def token_budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Exact deterministic best-first selection under a token budget —
    the "keep the highest-quality documents until we have T training
    tokens" step of corpus assembly (the selection rule FineWeb-Edu-style
    classifier filtering applies after scoring). Keeps the maximal
    PREFIX of the corpus ordered by ``(score DESC, hash_bucket(id,salt)
    ASC, id ASC)`` whose cumulative ``weight`` (token count) stays
    <= ``budget`` — the first document that would cross the budget is
    dropped along with everything ranked after it, so the selection at
    budget T1 < T2 is a prefix of the selection at T2 (same salt) and
    membership is reproducible across runs, partitionings, and engines.

    Scale shape — NOT a global sort. Sorting a 100 TB corpus by score
    to take a prefix would range-shuffle everything; instead the
    boundary is located twice at aggregate level (the ``cap_per_group``
    recipe, weighted):

      1. per-score-class weight sums — map-side combinable, one row per
         DISTINCT score (scores here are quantized score6 longs, so the
         class table is <= ~1e6 rows regardless of corpus size);
         cumulative over score DESC finds the boundary class s* where
         the running token total crosses ``budget``. Classes above s*
         pass whole with NO per-row ranking; classes below are dropped
         at the scan.
      2. inside s* (the only class whose rows are touched
         individually): per-md5-bucket weight sums, cumulative over
         bucket ASC finds the boundary bucket b'; buckets below b' pass
         whole, and only b' itself (~class_size/1e6 rows) takes a
         per-row running sum ordered by id.

    So the expensive total order touches ~class/1e6 rows, never the
    corpus. ``score_col`` must be a non-null integer-quantized score
    (the repo's score6 convention — quantize continuous scores first or
    the class table degenerates toward one row per doc); ``weight_col``
    must be non-null and >= 0 (token counts); ``id_col`` values must be
    unique. Both aggregate cumulations run as single-partition windows
    over the TINY class/bucket tables (bounded by distinct-score count
    and 1e6 respectively), never over data."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    dfb = (
        df.withColumn("__s", F.col(score_col).cast("long"))
        .withColumn("__w", F.col(weight_col).cast("long"))
        .withColumn("__b", hash_bucket(F.col(id_col), salt))
    )
    keep_cols = [F.col(c) for c in df.columns]

    # level 1: score classes, descending.
    cls = dfb.groupBy("__s").agg(F.sum("__w").alias("__sw"))
    cum = cls.withColumn(
        "__cum", F.sum("__sw").over(Window.orderBy(F.col("__s").desc()))
    )
    # boundary class = highest score whose running total crosses the
    # budget (absent when the whole corpus fits); __rem = budget left
    # for the boundary class itself.
    bound = cum.filter(F.col("__cum") > budget).agg(
        F.max("__s").alias("__sstar"),
        F.max_by(F.lit(budget) - (F.col("__cum") - F.col("__sw")), "__s").alias(
            "__rem"
        ),
    )
    joined = dfb.join(F.broadcast(bound), how="cross")
    above = joined.filter(
        F.col("__sstar").isNull() | (F.col("__s") > F.col("__sstar"))
    ).select(*keep_cols)

    # level 2: inside the boundary class, order (__b ASC, id ASC).
    at_cls = joined.filter(F.col("__s") == F.col("__sstar"))
    bcls = at_cls.groupBy("__b", "__rem").agg(F.sum("__w").alias("__bw"))
    bcum = bcls.withColumn(
        "__bcum", F.sum("__bw").over(Window.orderBy(F.col("__b")))
    )
    bbound = bcum.filter(F.col("__bcum") > F.col("__rem")).agg(
        F.min("__b").alias("__bstar"),
        F.min_by(F.col("__rem") - (F.col("__bcum") - F.col("__bw")), "__b").alias(
            "__rem2"
        ),
    )
    j2 = at_cls.join(F.broadcast(bbound), how="cross")
    below_b = j2.filter(
        F.col("__bstar").isNull() | (F.col("__b") < F.col("__bstar"))
    ).select(*keep_cols)
    # only the boundary bucket takes a per-row running sum; weights are
    # >= 0 so the running sum is monotone and `<= __rem2` IS the
    # maximal prefix (a crossing doc blocks everything ranked after it).
    at_b = (
        j2.filter(F.col("__b") == F.col("__bstar"))
        .withColumn(
            "__run",
            F.sum("__w").over(
                Window.partitionBy("__b")
                .orderBy(F.col(id_col))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("__run") <= F.col("__rem2"))
        .select(*keep_cols)
    )
    return above.unionByName(below_b).unionByName(at_b)


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str, salt: str = ""
) -> DataFrame:
    """Stable ``rate``-fraction sample: a row is in the sample for every
    run, every partitioning, every engine. Supersampling property: the
    sample at rate r1 < r2 is a subset of the sample at r2 (same salt),
    so nested subsamples come for free."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(F.col(id_col), salt) < int(round(rate * BUCKETS)))

def unimax_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
    epochs_cap: int = 2,
) -> DataFrame:
    """UniMax language/budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): split a total token ``budget`` across
    groups (languages, sources) so every group gets an equal share of
    the budget EXCEPT groups too small to absorb it, which are capped
    at ``epochs_cap`` repetitions of their available tokens and return
    the unused mass to the pool. Temperature sampling
    (``temperature_sample``) trades a single alpha between head and
    tail; UniMax instead maximizes the minimum share subject to the
    repetition cap — the water-filling solution.

    Closed form instead of the paper's sequential greedy: with groups
    sorted ascending by cap_g = epochs_cap * n_g, the greedy's
    equal-share watermark is CONSTANT once the first group exceeds it
    (allocating exactly the fair share leaves the per-remaining-group
    share unchanged), so "capped" is a sorted PREFIX — group i is
    capped iff cap_i * (L - i + 1) + cumcap_{i-1} <= budget, and the
    LHS is non-decreasing in i. One window pass finds the boundary;
    everyone past it splits the remaining budget equally. Exact-integer
    LHS, so the boundary test is engine-portable; the only floating
    step is the final remainder division (single IEEE op, bit-identical
    cross-engine).

    Scale shape: one map-side-combinable agg collapses the corpus to
    the GROUP table (#languages rows); every window below runs on that
    tiny table (unpartitioned window — deliberate and safe at any
    corpus size, the frame is #groups, never #docs). Output is the
    allocation table (group, n_docs, n_tokens, alloc_tokens, epochs6);
    downstream sampling broadcast-joins it back, the corpus never
    reshuffles. epochs6 = round(alloc / n_tokens * 1e6) can exceed 1e6:
    capped groups sit exactly at epochs_cap * 1e6 (repetition), the
    uncapped remainder share is below it by construction of the sort.

    No lieu analog — beyond-reference training-mixture operator, same
    family as temperature_sample / token_budget_select.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if epochs_cap <= 0:
        raise ValueError(f"epochs_cap must be positive, got {epochs_cap}")
    from pyspark.sql import Window

    # weights must be non-negative (same precondition token_budget_select
    # documents — a negative weight breaks the cap sort's monotone
    # boundary argument). All-NULL-weight groups coalesce to n_tokens=0
    # rather than corrupting the nulls-first cap sort.
    counts = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(
            F.sum(F.col(weight_col).cast("long")), F.lit(0).cast("long")
        ).alias("n_tokens"),
    )
    capd = counts.withColumn(
        "__cap", (F.lit(int(epochs_cap)) * F.col("n_tokens")).cast("long")
    )
    w_ord = Window.orderBy(F.asc("__cap"), F.asc(group_col))
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()  # whole (tiny) group table
    b = F.lit(int(budget)).cast("long")
    stepped = (
        capd.withColumn("__i", F.row_number().over(w_ord))
        .withColumn("__cum", F.sum("__cap").over(w_run))
        .withColumn("__L", F.count("*").over(w_all))
    ).withColumn(
        "__capped",
        (
            F.col("__cap") * (F.col("__L") - F.col("__i") + F.lit(1))
            + (F.col("__cum") - F.col("__cap"))
        )
        <= b,
    )
    scal = stepped.withColumn(
        "__kcum",
        F.coalesce(
            F.max(F.when(F.col("__capped"), F.col("__cum"))).over(w_all),
            F.lit(0).cast("long"),
        ),
    ).withColumn(
        "__nun",
        F.col("__L")
        - F.coalesce(
            F.max(F.when(F.col("__capped"), F.col("__i"))).over(w_all),
            F.lit(0),
        ),
    )
    alloc = F.when(F.col("__capped"), F.col("__cap").cast("double")).otherwise(
        (b - F.col("__kcum")).cast("double") / F.col("__nun")
    )
    # n_tokens == 0 (all-zero/all-null weights): cap = 0, the group is
    # capped at alloc 0.0, and the unguarded ratio is 0.0/0 = NaN whose
    # long cast THROWS under ANSI — emit epochs6 = 0 instead of killing
    # the job on a degenerate group. (Double division itself never
    # throws, so the guarded branch is safe even if CSE hoists it.)
    epochs6 = F.when(
        F.col("n_tokens") > 0,
        F.round(alloc / F.col("n_tokens") * F.lit(1e6)),
    ).otherwise(F.lit(0.0))
    return (
        scal.withColumn("alloc_tokens", F.round(alloc).cast("long"))
        .withColumn("epochs6", epochs6.cast("long"))
        .select(group_col, "n_docs", "n_tokens", "alloc_tokens", "epochs6")
        .orderBy(group_col)
    )

def unimax_expand(
    df: DataFrame,
    alloc: DataFrame,
    group_col: str,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Materialize a ``unimax_allocation`` table into the training
    mixture itself: every row appears ``floor(epochs)`` times, plus one
    more time for a deterministic ``frac(epochs)``-rate subset of its
    group (the md5-bucket recipe — epochs6 is quantized to the same 1e6
    grid as ``hash_bucket``, so the fractional epoch IS a bucket
    threshold, no further rounding). Output adds an ``epoch`` column
    (1-based copy index) so downstream shuffling/packing can keep
    repeats apart.

    In expectation each group contributes alloc_tokens exactly; the
    realized count is the usual deterministic-hash binomial. Scale
    shape: the allocation table is #groups rows — broadcast join, the
    corpus never shuffles; the expansion is a narrow explode of a
    when-guarded sequence (Spark's sequence(1, 0) is a DESCENDING
    2-element array, never an empty one — the guard is load-bearing).
    """
    a = alloc.select(F.col(group_col).alias("__ux_g"), "epochs6")
    n_full = F.expr("CAST(epochs6 DIV 1000000 AS BIGINT)")
    frac = F.col("epochs6") % F.lit(1_000_000)
    extra = (hash_bucket(F.col(id_col), salt) < frac).cast("long")
    return (
        # eqNullSafe: unimax_allocation counts a NULL group (missing
        # metadata) like any other and assigns it budget — a plain
        # equi-join would silently throw that allocation away (and the
        # other groups were shrunk to fund it); NULL-group docs must
        # expand at their allocated rate
        df.join(
            F.broadcast(a), F.col(group_col).eqNullSafe(F.col("__ux_g"))
        )
        .drop("__ux_g")
        .withColumn("__copies", n_full + extra)
        .withColumn(
            "epoch",
            F.explode(
                F.when(
                    F.col("__copies") >= 1,
                    F.sequence(F.lit(1).cast("long"), F.col("__copies")),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .drop("epochs6", "__copies")
    )
