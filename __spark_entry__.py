"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-dup pipeline on sf0.001-derived
transcripts. ``queries()`` / ``oracle_sql()`` — one entry per operator
family from SURVEY.md §2 plus the training-data ops (dedup variants,
ANN, text analysis, multimodal plumbing); DuckDB oracles live in
lieu_spark/oracle_sql.py. Hash-kernel paths (MinHash bands, SimHash,
winnow fingerprints, LSH buckets) are oracle-checked through the parquet
export side-channel (lieu_spark.oracle_export): the kernel output is a
file both engines read, so the relational halves are value-verified.
Every queries() key has an oracle_sql() twin (one per entry — see
queries() for the authoritative count): the
non-SQL-expressible kernels (LCS argmax, IVF centroids, MinHash/SimHash/
bucket hashes, fake-codec dims) stay pytest-verified, but their
downstream relational work — and for copied_spans the substring
NECESSARY CONDITION of every reported span — is DuckDB-value-verified
through the export channel.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lieu_spark import queries as Q  # noqa: E402
from lieu_spark.config import DedupeConfig  # noqa: E402
from lieu_spark.oracle_sql import ORACLE  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedupe pipeline over transcripts derived from the
    sf0.001 documents table -> verified duplicate pairs."""
    return Q.q_dedupe_pairs_pipeline(spark, "/root/testdata/sf0.001")


# --- export-backed oracle entries (lieu_spark.oracle_export) ---------------
# Each writes its hash-kernel OUTPUT table to a parquet, rebuilds its own
# result from that file, and the DuckDB oracle reads the same file — so
# the relational half (grouping / collision joins / pair generation /
# re-rank) is value-hash-verified; only the numpy/JVM kernels stay
# pytest-verified (bit-equality suites in tests/).


def _q_minhash_band_sizes(spark, sf_dir):
    """F2 band grouping, oracle-checked via the exported band table."""
    from lieu_spark.operators.lsh import band_stats, band_table
    from lieu_spark.oracle_export import export_for_oracle

    cfg = DedupeConfig()
    feats = Q.feats_minhash(spark, sf_dir)
    bands = export_for_oracle(spark, band_table(feats, cfg), "minhash_bands")
    return band_stats(bands, cfg).orderBy("band", "band_hash")


def _q_simhash_pairs(spark, sf_dir):
    """F3 simhash blocking + hamming verify, oracle-checked via the
    exported (id, simhash) table: DuckDB re-derives chunk collisions with
    shift/mask bit arithmetic and hamming with bit_count(xor)."""
    from lieu_spark.functions.simhash import with_simhash
    from lieu_spark.operators.simhash_path import simhash_candidate_pairs
    from lieu_spark.oracle_export import export_for_oracle

    cfg = DedupeConfig()
    feats = with_simhash(Q.doc_features(spark, sf_dir), cfg)
    sh = export_for_oracle(
        spark,
        feats.select(F.col("conv_id").alias("id"), "simhash"),
        "simhash_values",
    )
    return (
        simhash_candidate_pairs(sh, cfg, id_col="id")
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_a", "id_b")
    )


def _q_span_candidates(spark, sf_dir):
    """Winnowing span-candidate generation (inverted fingerprint index +
    stop-shingle filter + >=min_shared pair join), oracle-checked via the
    exported (id, h) fingerprint table."""
    from lieu_spark.operators.spans import (
        winnow_fingerprints,
        winnow_pairs_from_fingerprints,
    )
    from lieu_spark.oracle_export import export_for_oracle

    cfg = DedupeConfig()
    feats = Q.doc_features(spark, sf_dir)
    fp = export_for_oracle(
        spark, winnow_fingerprints(feats, cfg), "winnow_fingerprints"
    )
    return winnow_pairs_from_fingerprints(fp, cfg, keep_counts=True).orderBy(
        "id_a", "id_b"
    )


def _q_copied_spans(spark, sf_dir):
    """Suffix-array LCS spans. The argmax itself is not SQL-expressible,
    but every reported span has a CHECKABLE necessary condition: it must
    be a genuine common substring of both docs at the reported offsets
    with the reported length (>= span_min_len). The spans and the doc
    texts are exported; the DuckDB oracle returns exactly the exported
    spans that PASS the substr-equality check — a fabricated or
    misaligned span drops out and fails the row/hash compare."""
    from lieu_spark.oracle_export import export_for_oracle

    feats = Q.doc_features(spark, sf_dir)
    export_for_oracle(
        spark, feats.select("conv_id", "doc"), "span_docs", single_file=False
    )
    return export_for_oracle(
        spark, Q.spans_df(spark, sf_dir), "copied_spans_out"
    ).orderBy("id_a", "id_b")


def _ann_buckets_export(spark, sf_dir):
    from lieu_spark.operators.ann import hyperplane_buckets
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.load(spark, sf_dir, "embeddings")
    return e, export_for_oracle(spark, hyperplane_buckets(e), "ann_buckets")


def _bucket_rerank(e, buckets):
    """Candidates from bucket collisions; exact-cosine re-rank on the
    ROUNDED value (cos6) with id tie-break so ordering is engine-exact —
    the same convention as q_ann_topk."""
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), ["table", "bucket"])
        .filter(F.col("l.id") != F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _cos6_rerank(e, cand)


def _cos6_rerank(e, cand):
    """Exact cosine over a candidate pair set, quantized to cos6 (the
    cross-engine ordering key)."""
    from lieu_spark.functions.vectors import cosine_with_norms, dot, norm

    base = e.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).withColumn("nrm", norm(F.col("vec")))
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        cand.join(a, "id_a")
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
        .select("id_a", "id_b", "cos6")
    )


def _q_ann_lsh_topk(spark, sf_dir):
    """Scale-safe ANN (hyperplane LSH buckets, no cartesian), now
    oracle-checked via the exported bucket table."""
    from pyspark.sql import Window

    e, buckets = _ann_buckets_export(spark, sf_dir)
    scored = _bucket_rerank(e, buckets)
    w = Window.partitionBy("id_a").orderBy(F.col("cos6").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("id_a").alias("vec_id"), "rank", F.col("id_b").alias("nbr_id"), "cos6"
        )
        .orderBy("vec_id", "rank")
    )


def _q_embedding_neardup_lsh(spark, sf_dir):
    """Scale-safe embedding near-dup (bucket collisions, cos6 >= 0.95),
    oracle-checked via the exported bucket table — the value-verified
    twin of the bounded brute-force embedding_neardup. Runs over emb_aug
    (25 planted exact-copy vectors) so the check is non-vacuous; an
    exact copy shares every bucket in every table, so LSH recall on the
    planted pairs is 1.0 by construction."""
    from lieu_spark.operators.ann import hyperplane_buckets
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.emb_aug(spark, sf_dir)
    buckets = export_for_oracle(
        spark, hyperplane_buckets(e), "neardup_buckets"
    )
    scored = _bucket_rerank(e, buckets)
    return (
        scored.filter((F.col("cos6") >= 950000) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "cos6")
        .orderBy("id_a", "id_b")
    )


def _q_semantic_decon(spark, sf_dir):
    """Embedding-based (semantic) decontamination — the cosine analog
    of the n-gram containment/verbatim rules: flag every TRAIN vector
    whose embedding is >= 0.95 cosine to ANY EVAL vector. Scale shape
    is the cross-corpus LSH bucket join (near-dup regime nbits=8 T=8,
    identical vectors share every bucket so recall on true contamination
    is 1.0 by construction) — never an eval x train cross join; exact
    cosine verifies candidates only. Planted: eval = 50 natural vectors
    (background cos ~0.5, none flag) + exact copies of train ids < 25
    (+100000) — exactly the 25 copy sources flag at cos6 = 1e6. Oracle
    via the exported two-sided bucket table: DuckDB re-derives the
    eval->train collisions, every cosine, and the per-train-doc hit
    aggregation."""
    from lieu_spark.operators.ann import hyperplane_buckets
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.load(spark, sf_dir, "embeddings")
    train = e.filter(F.col("vec_id") < 500).select(
        "vec_id", "embedding", F.lit("train").alias("side")
    )
    ev_nat = e.filter((F.col("vec_id") >= 500) & (F.col("vec_id") < 550)).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        "embedding",
        F.lit("eval").alias("side"),
    )
    ev_cont = e.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        F.lit("eval").alias("side"),
    )
    both = train.unionByName(ev_nat).unionByName(ev_cont)
    buckets = hyperplane_buckets(both, nbits=8, ntables=8).join(
        both.select(F.col("vec_id").alias("id"), "side"), "id"
    )
    bk = export_for_oracle(spark, buckets, "decon_buckets")
    cand = (
        bk.filter(F.col("side") == "eval")
        .alias("l")
        .join(
            bk.filter(F.col("side") == "train").alias("r"),
            ["table", "bucket"],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    scored = _cos6_rerank(both, cand)
    return (
        scored.filter(F.col("cos6") >= 950000)
        .groupBy(F.col("id_b").alias("train_id"))
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("cos6").alias("max_cos6"),
        )
        .orderBy("train_id")
    )


def _q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN, oracle-checked via the exported cell-assignment table:
    the k-means quantizer (the only non-SQL kernel — ann.py:193) writes
    (id, probe_rank, cell) once; candidate generation (probe-list join
    member-list on cell), the exact-cosine re-rank, and the top-k window
    are rebuilt from that export by BOTH engines, ranking on the rounded
    cos6 with id tie-break (same engine-exact convention as
    ann_lsh_topk). Same non-cartesian scale shape as ivf_topk."""
    from pyspark.sql import Window

    from lieu_spark.operators.ann import ivf_cells, ivf_centroids
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.load(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e, ncentroids=16)
    cells = export_for_oracle(
        spark, ivf_cells(e, cents, nprobe=6), "ivf_cells"
    )
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
    scored = _cos6_rerank(e, cand)
    w = Window.partitionBy("id_a").orderBy(F.col("cos6").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("id_a").alias("vec_id"), "rank", F.col("id_b").alias("nbr_id"), "cos6"
        )
        .orderBy("vec_id", "rank")
    )


def _q_ann_multiprobe_topk(spark, sf_dir):
    """Multi-probe hyperplane LSH (single-bit lowest-margin
    perturbations, Lv et al. VLDB'07 — operators/ann.py
    hyperplane_probes): a query's candidates are its probe list joined
    against MEMBER buckets (probe_rank 0) — the IVF probes-vs-members
    shape, so recall rises without growing the stored index. Oracle-
    checked via the exported (id, table, probe_rank, bucket) table;
    measured at iso-candidate-budget on the sf0.1 vectors: recall@5
    0.676 vs the single-probe default's 0.642 with HALF the tables
    (BENCH.md knob table)."""
    from pyspark.sql import Window

    from lieu_spark.operators.ann import hyperplane_probes
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.load(spark, sf_dir, "embeddings")
    probes = export_for_oracle(
        spark,
        hyperplane_probes(e, nbits=8, ntables=8, nprobes=8),
        "mp_probes",
    )
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
    scored = _cos6_rerank(e, cand)
    w = Window.partitionBy("id_a").orderBy(F.col("cos6").desc(), F.col("id_b").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("id_a").alias("vec_id"), "rank", F.col("id_b").alias("nbr_id"), "cos6"
        )
        .orderBy("vec_id", "rank")
    )


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup cluster-then-prune (operators/semdedup.py, Abbas et al.
    arXiv:2303.09540) over emb_aug (25 planted exact copies, so the
    prune is non-vacuous: a copy lands in its original's cell with the
    same cent_cos6 and is dropped by the id tie-break). Oracle-checked
    via the exported (id, cell, cent_cos6) assignment table — the
    k-means quantizer is the only non-SQL kernel; the rank window, the
    within-cell ordered pair join, the exact-cosine prune, and the keep
    flag are rebuilt from that export by BOTH engines."""
    from lieu_spark.operators.ann import ivf_centroids
    from lieu_spark.operators.semdedup import semantic_cells, semantic_dedup_flags
    from lieu_spark.oracle_export import export_for_oracle

    e = Q.emb_aug(spark, sf_dir)
    cents = ivf_centroids(e, ncentroids=16)
    asg = export_for_oracle(spark, semantic_cells(e, cents), "semdedup_cells")
    return (
        semantic_dedup_flags(e, asg, tau=0.95)
        .select(
            F.col("id").alias("vec_id"),
            "cell",
            "cent_cos6",
            F.col("keep").cast("int").alias("keep"),
        )
        .orderBy("vec_id")
    )


def _q_span_scrub(spark, sf_dir):
    """Exact-substring dedupe REMOVAL (operators/spans.py
    remove_copied_spans): copied_spans detects cross-conversation
    copied text; this cuts it out of the copy side (id_b — the larger
    id; the canonical smaller id keeps its text), merging overlapping/
    adjacent cuts per doc first. Oracle-checked via the exported spans
    + docs tables: DuckDB independently merges the intervals (window
    SQL) and rebuilds the kept text as the ordered concatenation of gap
    segments — the sha of every scrubbed doc must match the Catalyst
    fold's output character for character."""
    from lieu_spark.operators.spans import remove_copied_spans
    from lieu_spark.oracle_export import export_for_oracle

    feats = Q.doc_features(spark, sf_dir)
    docs = feats.select("conv_id", "doc")
    spans = export_for_oracle(spark, Q.spans_df(spark, sf_dir), "scrub_spans")
    export_for_oracle(spark, docs, "scrub_docs", single_file=False)
    out = remove_copied_spans(docs, spans)
    return out.select(
        "conv_id",
        "n_cut",
        F.sha2(F.col("doc_scrubbed"), 256).alias("scrub_sha"),
    ).orderBy("conv_id")


def _q_multimodal_meta(spark, sf_dir):
    """REAL header decode over a mixed BMP/PNG/JPEG/GIF fixture
    (functions/multimodal.synthetic_image_payloads): every doc gets a
    genuine container payload whose dims/channels are integer functions
    of doc_id, the mapInPandas real decoder parses the actual bytes
    (BITMAPINFOHEADER / IHDR / SOF0 marker walk), and DuckDB re-derives
    the expected metadata from doc_id ARITHMETIC plus octet_length of
    the exported payloads — a misparse of any header mismatches."""
    from lieu_spark.functions.multimodal import (
        decode_image_metadata,
        synthetic_image_payloads,
    )
    from lieu_spark.oracle_export import export_for_oracle

    d = Q.load(spark, sf_dir, "documents").select("doc_id")
    payloads = export_for_oracle(
        spark, synthetic_image_payloads(d), "multimodal_payloads",
        single_file=False,
    )
    meta = export_for_oracle(
        spark,
        decode_image_metadata(payloads, decoder="real"),
        "multimodal_meta",
    )
    return meta.orderBy("doc_id")


def _q_doc_fingerprint(spark, sf_dir):
    """Rolling polynomial fingerprint: Spark returns the PRODUCTION
    functions/analysis.doc_fingerprint column; DuckDB independently
    re-derives the ordered fold from the exported per-token hash
    sequence (list_reduce over list(th ORDER BY pos)) — the
    order-sensitive fold is value-verified against the product itself,
    and only the xxhash64 token kernel stays pytest-verified."""
    from lieu_spark.functions.text import tokenize
    from lieu_spark.oracle_export import export_for_oracle

    d = Q.load(spark, sf_dir, "documents")
    th = (
        d.select(
            "doc_id", F.posexplode_outer(tokenize(F.col("text"))).alias("pos", "tok")
        )
        .filter(F.col("tok").isNotNull())
        .select(
            "doc_id", "pos", F.pmod(F.xxhash64("tok"), F.lit(1 << 31)).alias("th")
        )
    )
    export_for_oracle(spark, th, "doc_token_hashes", single_file=False)
    # the SPARK side returns the PRODUCTION fingerprint column
    # (functions/analysis.doc_fingerprint) — DuckDB independently
    # re-derives the fold from the exported hash sequence, so a change
    # to the production multiplier/modulus/token handling MISMATCHES
    # instead of being silently copied into both sides (the check
    # verifies the product, not a twin of itself)
    from lieu_spark.functions.analysis import doc_fingerprint

    return d.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def _q_curate_funnel(spark, sf_dir):
    """The COMPOSED curation funnel (lieu_spark/curate.py) as one
    driver-verified query: run curate() over the documents table with a
    deterministic holdout (doc_id < 10), then emit one summary row per
    stage — (stage, n_rows, bit_xor of member ids) — so membership of
    every stage is value-verified, not just the counts. The DuckDB twin
    re-derives the ENTIRE funnel from scratch: raw-text quality +
    repetition gate, PII scrub, shingle-containment decontamination,
    brute-force Jaccard>=0.9 ∪ exact-sha dedupe with recursive-CTE
    connected components (component min over the VARCHAR ids — the
    pipeline's string conv_id ordering), cluster-level md5 splits,
    quality-argmax representatives, and the next-fit packing walk. The
    stages are individually oracle-backed elsewhere; this row set
    verifies their COMPOSITION."""
    from lieu_spark.curate import curate
    from lieu_spark.oracle_sql import FUNNEL_CFG, FUNNEL_HOLDOUT_MAX

    docs = Q.load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    holdout = docs.filter(F.col("doc_id") < FUNNEL_HOLDOUT_MAX)
    res = curate(spark, docs, FUNNEL_CFG, holdout=holdout)

    def srow(name, df, idcol="doc_id"):
        return df.agg(
            F.lit(name).alias("stage"),
            F.count("*").alias("n_rows"),
            F.expr(f"bit_xor({idcol})").alias("xor_ids"),
        )

    bins = (
        res.packed.select("split", "shard", "seq")
        .dropDuplicates(["split", "shard", "seq"])
        .select(
            (
                F.when(F.col("split") == "train", F.lit(0))
                .when(F.col("split") == "val", F.lit(1))
                .otherwise(F.lit(2))
                .cast("long")
                * F.lit(1000000000).cast("long")
                + F.col("shard").cast("long") * F.lit(1000000).cast("long")
                + F.col("seq").cast("long")
            ).alias("bin_id")
        )
    )
    splits = res.splits.groupBy("split").agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(doc_id)").alias("xor_ids"),
    ).select(
        F.concat(F.lit("split_"), F.col("split")).alias("stage"),
        "n_rows",
        "xor_ids",
    )
    out = (
        srow("annotated", res.annotated)
        .unionByName(srow("filtered", res.filtered))
        .unionByName(srow("decontaminated", res.decon))
        .unionByName(
            srow(
                "clusters",
                res.clusters.select("cluster_id").distinct(),
                "cluster_id",
            )
        )
        .unionByName(splits)
        .unionByName(srow("kept", res.kept))
        .unionByName(srow("packed_bins", bins, "bin_id"))
    )
    return out.orderBy("stage")


def _driver_green() -> set[str]:
    """Query names with a triple-green row (rows+schema+hash, no err) in
    ANY CORRECTNESS_r*.json artifact sitting next to this file."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                green.add(name)
    return green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Dict ORDER is the driver's RUN ORDER, and each round's
    correctness artifact records exactly the first 50 entries — so the
    order is a priority schedule, not taxonomy, and it SELF-ROTATES:
    entries without a triple-green row in any CORRECTNESS_r*.json next
    to this file run first (in the static order below: new/changed
    entries lead), entries already driver-green run last (static order
    = cheapest first). Each round the 50-entry window therefore covers
    exactly what previous rounds' artifacts haven't, and the union of
    artifacts converges on all entries with no manual re-ordering.
    With no artifacts present the static order stands as written.

    Shared derived frames (features, signatures, shingle pairs,
    clusters) are persisted memos in lieu_spark.queries, so the
    dedupe-family entries reuse one computation per session instead of
    re-deriving per query."""
    base = {
        # --- group A: never driver-green / new / changed this round ---
        "asymmetry_guard": Q.q_asymmetry_guard,
        "verdict_revision": Q.q_verdict_revision,
        "sketch_rollup": Q.q_sketch_rollup,
        "soft_dedup": Q.q_soft_dedup,
        "kmv_distinct": Q.q_kmv_distinct,
        "cms_heavy_hitters": Q.q_cms_heavy_hitters,
        "event_funnel": Q.q_event_funnel,
        "theta_sketch_ops": Q.q_theta_sketch_ops,
        "histogram_quantiles": Q.q_histogram_quantiles,
        "image_neardup": Q.q_image_neardup,
        "image_dedup_groups": Q.q_image_dedup_groups,
        "video_neardup": Q.q_video_neardup,
        "audio_neardup": Q.q_audio_neardup,
        "image_dedup_reps": Q.q_image_dedup_reps,
        "hard_negatives": Q.q_hard_negatives,
        "image_decon": Q.q_image_decon,
        "line_dedup": Q.q_line_dedup,
        "normalized_exact_dup": Q.q_normalized_exact_dup,
        "top_ngrams": Q.q_top_ngrams,
        "gopher_rules": Q.q_gopher_rules,
        "audio_meta": Q.q_audio_meta,
        "video_meta": Q.q_video_meta,
        "span_scrub": _q_span_scrub,
        "lm_quality": Q.q_lm_quality,
        "dsir_weights": Q.q_dsir_weights,
        "geo_blocking": Q.q_geo_blocking,
        "geo_aliases": Q.q_geo_aliases,
        "safe_decode": Q.q_safe_decode,
        "bpe_merges": Q.q_bpe_merges,
        "bpe_token_counts": Q.q_bpe_token_counts,
        "verbatim_13gram_decon": Q.q_verbatim_13gram_decon,
        "bloom_decon": Q.q_bloom_decon,
        "nb_quality": Q.q_nb_quality,
        "centroid_classify": Q.q_centroid_classify,
        "snapshot_diff": Q.q_snapshot_diff,
        "refresh_clusters": Q.q_refresh_clusters,
        "dedup_tiers": Q.q_dedup_tiers,
        "group_cap": Q.q_group_cap,
        "global_cap": Q.q_global_cap,
        "token_budget_select": Q.q_token_budget_select,
        "chunk_documents": Q.q_chunk_documents,
        "temperature_mixture": Q.q_temperature_mixture,
        "unimax_mixture": Q.q_unimax_mixture,
        "unimax_sample": Q.q_unimax_sample,
        "ccnet_buckets": Q.q_ccnet_buckets,
        "semantic_decon": _q_semantic_decon,
        "semantic_dedup": _q_semantic_dedup,
        "ann_multiprobe_topk": _q_ann_multiprobe_topk,
        "copied_spans": _q_copied_spans,
        "info_gain_terms": Q.q_info_gain_terms,
        "curate_funnel": _q_curate_funnel,
        "multimodal_meta": _q_multimodal_meta,
        # --- group B: r2-green, truncated out of the r3 artifact ---
        "match_pairs": Q.q_match_pairs,
        "dedupe_clusters": Q.q_dedupe_clusters,
        "cluster_size_hist": Q.q_cluster_size_hist,
        "response_pairs_ranked": Q.q_response_pairs_ranked,
        "transcript_roundtrip": Q.q_transcript_roundtrip,
        "ann_topk": Q.q_ann_topk,
        "embedding_neardup": Q.q_embedding_neardup,
        "minhash_band_sizes": _q_minhash_band_sizes,
        "simhash_pairs": _q_simhash_pairs,
        "span_candidates": _q_span_candidates,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "ann_ivf_topk": _q_ann_ivf_topk,
        # --- group C: r3-green, cheapest first ---
        "agg_lineitem": Q.q_agg_lineitem,
        "join_enrich": Q.q_join_enrich,
        "anti_join": Q.q_anti_join,
        "semi_join": Q.q_semi_join,
        "argmax_per_group": Q.q_argmax_per_group,
        "topk_orders": Q.q_topk_orders,
        "set_ops": Q.q_set_ops,
        "rollup_sales": Q.q_rollup_sales,
        "cube_sales": Q.q_cube_sales,
        "revenue_by_nation": Q.q_revenue_by_nation,
        "window_events": Q.q_window_events,
        "sessionize": Q.q_sessionize,
        "id_assignment": Q.q_id_assignment,
        "json_extract": Q.q_json_extract,
        "order_price_quantiles": Q.q_order_price_quantiles,
        "above_avg_orders": Q.q_above_avg_orders,
        "ntile_price_deciles": Q.q_ntile_price_deciles,
        "conditional_agg_shipmodes": Q.q_conditional_agg_shipmodes,
        "ref_code_blocking": Q.q_ref_code_blocking,
        "doc_tokens": Q.q_doc_tokens,
        "doc_quality": Q.q_doc_quality,
        "doc_langid": Q.q_doc_langid,
        "binary_meta": Q.q_binary_meta,
        "pii_scrub": Q.q_pii_scrub,
        "doc_repetition": Q.q_doc_repetition,
        "tool_transitions": Q.q_tool_transitions,
        "split_assign": Q.q_split_assign,
        "mixture_sample": Q.q_mixture_sample,
        "corpus_shuffle": Q.q_corpus_shuffle,
        "pack_sequences": Q.q_pack_sequences,
        "boilerplate_scrub": Q.q_boilerplate_scrub,
        "asof_join": Q.q_asof_join,
        "range_join_events": Q.q_range_join_events,
        "term_counts_top": Q.q_term_counts_top,
        "index_merge_batches": Q.q_index_merge_batches,
        "tfidf_top_terms": Q.q_tfidf_top_terms,
        "multiset_jaccard": Q.q_multiset_jaccard,
        "doc_fingerprint": _q_doc_fingerprint,
        "exact_dup_groups": Q.q_exact_dup_groups,
        "exact_dup_pairs": Q.q_exact_dup_pairs,
        "ngram_jaccard_pairs": Q.q_ngram_jaccard_pairs,
        "contamination_pairs": Q.q_contamination_pairs,
        "dedupe_pairs_pipeline": Q.q_dedupe_pairs_pipeline,
        "leakage_safe_splits": Q.q_leakage_safe_splits,
        "cluster_representatives": Q.q_cluster_representatives,
        "weighted_jaccard": Q.q_weighted_jaccard,
        "bucketed_weighted_jaccard": Q.q_bucketed_weighted_jaccard,
        "cjk_neardup_pairs": Q.q_cjk_neardup_pairs,
        "soft_tfidf_pairs": Q.q_soft_tfidf_pairs,
    }
    green = _driver_green()
    if not green:
        return base
    pending = {k: v for k, v in base.items() if k not in green}
    done = {k: v for k, v in base.items() if k in green}
    return {**pending, **done}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
