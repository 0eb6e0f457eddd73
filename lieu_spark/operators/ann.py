"""Approximate nearest neighbors over embedding columns.

Three tiers (task brief: similarity-search as a first-class component):

- ``brute_force_topk`` — exact cosine top-k via a self-join. Correctness
  baseline and the oracle for the LSH variant. O(n^2) pairs: fine at
  test SF, not the 100 TB path.
- ``hyperplane_lsh_topk`` — random-hyperplane (SimHash-for-cosine)
  bucketing: ``nbits`` signed projections -> one integer bucket key per
  ``ntables`` independent tables; candidates = bucket collisions in any
  table; exact cosine re-rank on candidates. Scale path: the self-join
  shuffles on (table, bucket) instead of exploding n^2; recall tunable
  by (nbits, ntables). Hyperplanes are deterministic from ``seed``,
  computed JVM-side: bucket bit i = sign(dot(v, h_i)) packed via
  aggregate — no UDF, no driver-side vectors.
- ``ivf_topk`` — FAISS-style IVF: spherical k-means coarse quantizer
  trained on a bounded driver-side sample, distributed cell assignment
  (one matmul per Arrow batch), candidates = members of the query's
  nprobe nearest cells, exact-cosine re-rank. The alternative scale
  path when the corpus is clustered (high recall at tiny nprobe),
  vs hyperplane LSH which is data-independent.

Partitioning note for callers: the bucket/cell pandas UDFs are
CPU-heavy matmuls. Fed straight from a parquet scan (the in-repo
paths), partitioning follows the files and parallelism is fine; fed
from a SHUFFLE output, AQE's byte-based coalescing can collapse the
tiny vector rows into 1-2 tasks and serialize the matmuls — such
callers should ``repartition`` first (CLAUDE.md rule; packing.py and
build_features do exactly this before their pandas stages).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_with_norms, dot, norm


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))


def _pair_cosine(left: DataFrame, right: DataFrame) -> DataFrame:
    """(id_a, id_b, cosine) for the cross of two (id, vec, nrm) frames."""
    a = left.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = right.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn(
            "cosine",
            cosine_with_norms(
                dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a"), F.col("nrm_b")
            ),
        )
        .select("id_a", "id_b", "cosine")
    )


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per id_a: by cosine desc, id_b asc tie-break."""
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id_a", "id_b", "cosine", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    base = _with_norm(embeddings, id_col, vec_col)
    return _topk(_pair_cosine(base, base), k)


def hyperplanes(dim: int, nbits: int, ntables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((ntables, nbits, dim))


def _make_buckets_udf(nbits: int, ntables: int, seed: int):
    """pandas UDF: embedding -> array of ntables bucket keys.

    One numpy matmul per Arrow batch ((batch x dim) @ (dim x T*nbits)).
    An earlier all-JVM formulation built T*nbits aggregate-over-zip_with
    expressions with literal hyperplane arrays — correct, but Catalyst
    spent ~20 s COMPILING the generated code per query. Codegen size is
    a real cost dimension; a matmul UDF is the right tool here.

    Hyperplanes are a pure function of (seed, dim) and are generated
    lazily INSIDE the UDF from the batch's own vector width — no Spark
    action (``.first()``) during plan construction, and every executor
    derives bit-identical planes from the shared seed."""
    from pyspark.sql.types import ArrayType, LongType

    powers = (1 << np.arange(nbits, dtype=np.int64))[None, None, :]
    cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = x.shape[1]
        w = cache.get(dim)
        if w is None:
            w = hyperplanes(dim, nbits, ntables, seed).reshape(
                ntables * nbits, dim
            ).T.copy()  # (dim, T*nbits)
            cache[dim] = w
        proj = x @ w  # (n, T*nbits)
        bits = (proj >= 0).reshape(len(vecs), ntables, nbits)
        keys = (bits * powers).sum(axis=2)  # (n, T)
        return pd.Series(list(keys.astype(np.int64)))

    return buckets


def hyperplane_buckets(
    embeddings: DataFrame,
    nbits: int = 6,
    ntables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) — one row per (vector, table).

    Parameter guide (p_bit = 1 - acos(cos)/pi; hit = 1-(1-p_bit^nbits)^T):
    moderate-similarity top-k (cos ~0.3-0.5): nbits=6, T=16;
    near-duplicate search (cos >= 0.95): nbits=8, T=8 (hit ~0.99)."""
    udf = _make_buckets_udf(nbits, ntables, seed)
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return base.select(
        "id", F.posexplode(udf(F.col("vec"))).alias("table", "bucket")
    ).withColumn("table", F.col("table").cast("long"))


def _make_probes_udf(nbits: int, ntables: int, seed: int, nprobes: int):
    """pandas UDF: embedding -> flat array of ntables*nprobes bucket
    keys, ordered (table 0 probes 0..P-1, table 1 probes 0..P-1, ...).
    Probe 0 is the member bucket; probe p >= 1 flips the bit with the
    p-th SMALLEST projection margin |dot(v, h_i)| — the bit most likely
    to be on the wrong side for a true neighbor (multi-probe LSH,
    Lv et al., VLDB'07, single-bit perturbations). Same
    one-matmul-per-Arrow-batch shape as the bucket UDF; plane cache
    shared per (dim).

    nprobes is clamped to nbits+1 (member + one flip per bit): the UDF
    must emit EXACTLY ntables*nprobes keys per vector or the caller's
    pos -> (table, probe_rank) arithmetic misaligns."""
    from pyspark.sql.types import ArrayType, LongType

    nprobes = min(nprobes, nbits + 1)
    powers = (1 << np.arange(nbits, dtype=np.int64))[None, None, :]
    cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(ArrayType(LongType()))
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        n, dim = x.shape
        w = cache.get(dim)
        if w is None:
            w = hyperplanes(dim, nbits, ntables, seed).reshape(
                ntables * nbits, dim
            ).T.copy()
            cache[dim] = w
        proj = (x @ w).reshape(n, ntables, nbits)
        bits = proj >= 0
        main = (bits * powers).sum(axis=2)  # (n, T)
        if nprobes == 1:
            return pd.Series(list(main.astype(np.int64)))
        # bit indices by |margin| ascending; flipping bit i == XOR 2^i
        order = np.argsort(np.abs(proj), axis=2, kind="stable")[
            :, :, : nprobes - 1
        ]  # (n, T, P-1)
        flipped = main[:, :, None] ^ (1 << order.astype(np.int64))
        keys = np.concatenate([main[:, :, None], flipped], axis=2)  # (n, T, P)
        return pd.Series(list(keys.reshape(n, ntables * nprobes).astype(np.int64)))

    return probes


def hyperplane_probes(
    embeddings: DataFrame,
    nbits: int = 8,
    ntables: int = 8,
    seed: int = 42,
    nprobes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, probe_rank, bucket) — probe_rank 0 is the member
    bucket (identical to ``hyperplane_buckets`` at the same knobs),
    ranks 1..nprobes-1 are lowest-margin single-bit flips. The member
    rows ARE the index; probe rows exist only on the query side, so
    multi-probe raises recall without growing the stored index — the
    standard trade against adding tables (which doubles BOTH sides of
    the collision join and the index footprint)."""
    if nprobes < 1:
        raise ValueError(f"nprobes must be >= 1, got {nprobes}")
    nprobes = min(nprobes, nbits + 1)  # same clamp as the UDF
    udf = _make_probes_udf(nbits, ntables, seed, nprobes)
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return base.select(
        "id", F.posexplode(udf(F.col("vec"))).alias("pos", "bucket")
    ).select(
        "id",
        (F.col("pos") / nprobes).cast("long").alias("table"),
        F.pmod(F.col("pos"), F.lit(nprobes)).cast("int").alias("probe_rank"),
        "bucket",
    )


def hyperplane_multiprobe_topk(
    embeddings: DataFrame,
    k: int,
    nbits: int = 8,
    ntables: int = 8,
    seed: int = 42,
    nprobes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe hyperplane LSH top-k: candidates = a query's probe
    list (all ranks) joined against MEMBER buckets (rank 0) per table —
    the IVF probes-vs-members shape — then exact-cosine re-rank.

    Scale shape: shuffles on (table, bucket); the member side is the
    same size as single-probe LSH (n*T rows), only the query side grows
    by the probe factor. At equal recall this beats raising ntables,
    which multiplies the index, both join sides, AND the signature
    cost."""
    # lazy localCheckpoint: the member filter and the query side are
    # DIFFERENTLY-pruned consumers of the signature UDF subtree, so
    # exchange reuse never unifies them (the repo-wide Catalyst lesson)
    # — without it the dominant matmul UDF ran twice over the corpus
    probes = hyperplane_probes(
        embeddings, nbits, ntables, seed, nprobes, id_col, vec_col
    ).localCheckpoint(eager=False)
    members = probes.filter(F.col("probe_rank") == 0).select(
        F.col("id").alias("id_b"), "table", "bucket"
    )
    cand = (
        probes.select(F.col("id").alias("id_a"), "table", "bucket")
        .join(members, ["table", "bucket"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    base = _with_norm(embeddings, id_col, vec_col)
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine",
            cosine_with_norms(
                dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a"), F.col("nrm_b")
            ),
        )
        .select("id_a", "id_b", "cosine")
    )
    return _topk(scored, k)


def hyperplane_lsh_topk(
    embeddings: DataFrame,
    k: int,
    nbits: int = 6,
    ntables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = None,
) -> DataFrame:
    """``bucket_cap`` (off by default) applies the same salted sub-split
    as the MinHash/SimHash blocking paths to any (table, bucket) group
    larger than the cap — the 100 TB guard when embeddings cluster so
    hard that one bucket goes quadratic. Cross-sub candidates of a split
    bucket are recovered probabilistically by the other tables (raise
    ntables when capping), unlike the dedupe paths' deterministic
    pigeonhole recovery — hence opt-in here, default-on there."""
    buckets = hyperplane_buckets(embeddings, nbits, ntables, seed, id_col, vec_col)
    join_keys = ["table", "bucket"]
    if bucket_cap is not None:
        from .lsh import salted_groups

        buckets = salted_groups(buckets, ["table", "bucket"], bucket_cap).select(
            "table", "bucket", "sub", "id"
        )
        join_keys = ["table", "bucket", "sub"]
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), join_keys)
        .filter(F.col("l.id") != F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    base = _with_norm(embeddings, id_col, vec_col)
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine",
            cosine_with_norms(
                dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a"), F.col("nrm_b")
            ),
        )
        .select("id_a", "id_b", "cosine")
    )
    return _topk(scored, k)


def ivf_centroids(
    embeddings: DataFrame,
    ncentroids: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_limit: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer, FAISS-IVF style.

    Trains on a bounded deterministic sample (lowest ``sample_limit``
    ids) collected to the driver — the standard IVF recipe: training is
    O(sample * ncentroids), independent of corpus size, so it stays
    driver-side even at 100 TB while assignment stays distributed.
    Centroids are L2-normalized (cosine metric)."""
    rows = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy("id")
        .limit(sample_limit)
        .collect()
    )
    if not rows:
        raise ValueError(
            "ivf_centroids: embeddings frame is empty — nothing to train "
            "the coarse quantizer on (fully-filtered upstream stage?)"
        )
    x = np.stack([np.asarray(r.vec, dtype=np.float64) for r in rows])
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    xn = x / nrm
    rng = np.random.default_rng(seed)
    c = xn[rng.choice(len(xn), min(ncentroids, len(xn)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(xn @ c.T, axis=1)
        for j in range(len(c)):
            mask = assign == j
            if mask.any():
                v = xn[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def _make_cells_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding -> nprobe nearest cell ids (stable order:
    similarity desc, cell asc). Element 0 is the member cell. Same
    one-matmul-per-Arrow-batch shape as the hyperplane bucketer."""
    from pyspark.sql.types import ArrayType, LongType

    ct = centroids.T.copy()  # (dim, nc)

    @F.pandas_udf(ArrayType(LongType()))
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = (x / nrm) @ ct
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int64)))

    return cells


def ivf_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, probe_rank, cell): probe_rank 0 is the member cell; ranks
    0..nprobe-1 are the query's probe list."""
    udf = _make_cells_udf(centroids, nprobe)
    return (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .select("id", F.posexplode(udf(F.col("vec"))).alias("probe_rank", "cell"))
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int,
    ncentroids: int = 16,
    nprobe: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest
    centroid cell (inverted list); candidates for a query are the
    members of its ``nprobe`` nearest cells; exact-cosine re-rank.

    Scale shape: the candidate join shuffles on ``cell`` — n*nprobe
    probe rows against n member rows — instead of exploding n^2.
    K-means balances list sizes, so cell skew is bounded by data
    clusterativity (and AQE skew-join splits any hot cell). Recall
    tunable by nprobe/ncentroids; on clustered corpora (the near-dup
    regime) recall ~1 at nprobe ~ 1-2."""
    if centroids is None:
        centroids = ivf_centroids(
            embeddings, ncentroids, seed=seed, id_col=id_col, vec_col=vec_col
        )
    # lazy localCheckpoint: member filter + probe side would re-run
    # the cell-assignment UDF twice (same reasoning as multiprobe)
    cells = ivf_cells(
        embeddings, centroids, nprobe, id_col, vec_col
    ).localCheckpoint(eager=False)
    members = cells.filter(F.col("probe_rank") == 0).select(
        F.col("id").alias("id_b"), "cell"
    )
    probes = cells.select(F.col("id").alias("id_a"), "cell")
    cand = (
        probes.join(members, "cell")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    base = _with_norm(embeddings, id_col, vec_col)
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cosine",
            cosine_with_norms(
                dot(F.col("vec_a"), F.col("vec_b")), F.col("nrm_a"), F.col("nrm_b")
            ),
        )
        .select("id_a", "id_b", "cosine")
    )
    return _topk(scored, k)


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    nbits: int = 8,
    ntables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors (cosine >= threshold) via LSH buckets,
    normalized (id_a < id_b). BOUNDED at 50 candidate neighbors per
    vector per side (the top-k cut) — in a dup clique wider than ~100
    some cross-clique pairs exceed both endpoints' neighbor lists and
    are not emitted; cluster via connected components downstream (one
    surviving edge per clique member suffices) rather than relying on
    the full pairwise set. Pairs found from EITHER side survive: the
    pair is normalized with least/greatest BEFORE dedup (filtering
    id_a < id_b after the rank cut used to drop a pair whose small-id
    endpoint had 50 closer neighbors even when the large-id endpoint
    found it)."""
    topk = hyperplane_lsh_topk(
        embeddings, k=50, nbits=nbits, ntables=ntables, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    return (
        topk.filter(F.col("cosine") >= threshold)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "cosine",
        )
        .dropDuplicates(["id_a", "id_b"])
    )
