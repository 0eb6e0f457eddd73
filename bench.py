#!/usr/bin/env python3
"""Benchmark harness.

Headline: full transcript dedupe pipeline (assemble -> features ->
bands -> candidates -> verify -> cluster -> spans, all checkpointed to
stage tables) on the deterministic synthetic transcript corpus scaled to
$SPARK_GRAFT_SF_DIR, run at TWO parallelism levels — local[8] and
local[$SPARK_GRAFT_CPUS] — on identical input, as the sandbox stand-in
for the north rule's N vs 4N executor scaling requirement (BASELINE.md).

Prints ONE JSON line:
  {"metric": "transcript_dedupe_wall", "value": <sec at P2>,
   "unit": "sec", "queries": {<stage>: sec, ...}, "sf": <sf>,
   "turns": N, "turns_per_sec": ..., "scaling": {...}}

Each measured run happens in a subprocess launched via spark-submit
--py-files (the packaged-job shape the north rule requires); corpus
generation is cached to parquet and excluded from timed regions.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import pandas as pd  # module-global: pandas_udf type hints resolve here

REPO = Path(__file__).resolve().parent
CACHE = REPO / ".bench_cache"


def sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(sf: float) -> Path:
    return CACHE / f"transcripts_sf{sf}" / "transcripts.parquet"


def ensure_corpus(sf: float, n_convs: int) -> Path:
    path = corpus_path(sf)
    marker = path.parent / "_done.json"
    if marker.exists():
        meta = json.loads(marker.read_text())
        if meta.get("n_convs") == n_convs:
            return path
    sys.path.insert(0, str(REPO))
    from lieu_spark import corpus
    from lieu_spark.session import build_session

    spark = build_session("lieu_spark_gen", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    df = corpus.generate_df(spark, 42, n_convs)
    path.parent.mkdir(parents=True, exist_ok=True)
    df.write.mode("overwrite").parquet(str(path))
    spark.stop()
    marker.write_text(json.dumps({"n_convs": n_convs}))
    return path


def run_one(
    cores: int,
    sf_dir: str,
    corpus_parquet: str,
    out_json: str,
    stream_parity: bool = False,
    verify_mode: str = "shingles",
    pipeline_only: bool = False,
    store_dir: str | None = None,
) -> None:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from lieu_spark import queries as Q
    from lieu_spark.config import DedupeConfig
    from lieu_spark.pipeline import run_pipeline
    from lieu_spark.session import build_session

    cfg = DedupeConfig(verify_mode=verify_mode)
    spark = build_session(f"lieu_spark_bench_{cores}", cores=cores)

    # warmup (untimed): spin up python UDF workers on every core + JIT
    # the codegen paths, so the timed region measures steady state
    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s + 0

    spark.range(0, cores * 4, 1, numPartitions=cores * 2).select(
        F.sum(_warm(F.col("id")))
    ).collect()

    # hardware calibration: pure-codegen CPU job; its P1->P2 speedup is
    # this box's thread-scaling ceiling (local mode shares one memory
    # bus + clock budget, unlike adding cluster nodes) — see BENCH.md
    t0 = time.time()
    spark.range(0, 30_000_000_000, 1, numPartitions=cores * 2).select(
        F.sum(F.col("id") % 7)
    ).collect()
    range_wall = time.time() - t0

    tdf = spark.read.parquet(corpus_parquet)
    n_turns = tdf.count()

    # eager mode: each stage persists + materializes as it is built, so
    # stage_wall attributes cost to the stage that did the work (the lazy
    # DAG would bill everything to the first action). Checkpointed mode
    # is exercised in pytest — and selectable here (--store-dir) for
    # headroom probes past ~20x sf0.1: eager pins EVERY stage's
    # deserialized blocks for the whole run, which exceeds this box's
    # ~73 GB scratch at 30x (measured: shuffle-spill ENOSPC), while the
    # store path writes compressed parquet stage tables, cuts lineage at
    # each save so the ContextCleaner can drop finished shuffles, and is
    # the resumable production deployment shape. Stage walls stay
    # attributed: save() is the materialization point.
    store = None
    if store_dir:
        from lieu_spark.checkpoint import StageStore

        shutil.rmtree(store_dir, ignore_errors=True)  # probe never resumes
        store = StageStore(str(store_dir))
    t0 = time.time()
    res = run_pipeline(spark, tdf, cfg, store=store, eager=store is None)
    n_pairs = res.verified.count()
    n_candidates = res.candidates.count()
    n_docs = res.conversations.count()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    res.spans.count()
    wall = time.time() - t0
    # blocking effectiveness — the reference CLI's num_comparisons vs
    # N(N-1)/2 instrumentation (scripts/dedupe_geojson:441)
    timings = {k: round(v, 3) for k, v in res.stage_wall.items()}

    if pipeline_only:
        # verify-mode A/B runs compare pipeline_wall_sec only; the
        # secondary workloads would just add identical noise to both arms
        spark.stop()
        Path(out_json).write_text(json.dumps({
            "cores": cores,
            "verify_mode": verify_mode,
            "range_wall_sec": range_wall,
            "pipeline_wall_sec": wall,
            "turns": n_turns,
            "turns_per_sec": n_turns / wall if wall > 0 else 0.0,
            "verified_pairs": n_pairs,
            "stage_sec": timings,
        }))
        return

    # dup-pair recall (the BASELINE.json north metric), measured at bench
    # scale: ground-truth pairs get their TRUE jaccard via a direct pair
    # join (no blocking involved); recall = fraction of true-duplicate
    # pairs (J >= threshold_likely, or byte-exact) the pipeline classified
    # as duplicates. Corpus is generated with seed 42 (ensure_corpus).
    from lieu_spark.corpus import truth_df
    from lieu_spark.operators.verify import dupe_pairs, verify_pairs

    truth = truth_df(spark, 42, n_docs)
    tv = verify_pairs(truth.select("id_a", "id_b"), res.features, cfg, method="truth")
    should = tv.filter(
        (F.col("jaccard") >= cfg.threshold_likely) | F.col("is_exact")
    ).select("id_a", "id_b").persist()
    n_should = should.count()
    n_found = should.join(
        dupe_pairs(res.verified).select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).count()
    recall = n_found / n_should if n_should else 1.0

    # secondary workloads on the driver-provided tables
    t1 = time.time()
    doc_pairs = Q.q_dedupe_pairs_pipeline(spark, sf_dir).count()
    timings["doc_dedupe"] = time.time() - t1

    t2 = time.time()
    from lieu_spark.operators.ann import (
        _pair_cosine,
        _topk,
        _with_norm,
        hyperplane_lsh_topk,
        ivf_topk,
    )

    emb = Q.load(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    lsh_topk = hyperplane_lsh_topk(emb, k=5).persist()
    ann = lsh_topk.count()
    timings["ann_lsh_topk"] = time.time() - t2
    # IVF recall must be measured on vectors OUTSIDE the k-means
    # training sample (training members bias cell assignment recall
    # upward): train on the LOWEST ids, query the HIGHEST — disjoint
    n_rq = int(os.environ.get("ANN_RECALL_QUERIES", "200"))
    from lieu_spark.operators.ann import ivf_centroids

    cents = ivf_centroids(
        emb, ncentroids=16, sample_limit=min(4096, max(16, n_emb - n_rq))
    )
    t2b = time.time()
    ivf = ivf_topk(emb, k=5, centroids=cents).persist()
    ivf.count()
    timings["ann_ivf_topk"] = time.time() - t2b

    # measured ANN recall@5 vs exact-cosine ground truth (VERDICT r2 #6):
    # truth for a bounded query sample (ANN_RECALL_QUERIES highest ids —
    # held out of IVF training) against ALL candidates — Q*n pairs,
    # distributed, never n^2
    qids = [
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(F.col("vec_id").desc())
        .limit(n_rq)
        .collect()
    ]
    qdf = emb.filter(F.col("vec_id").isin(qids))
    truth_topk = _topk(
        _pair_cosine(
            _with_norm(qdf, "vec_id", "embedding"),
            _with_norm(emb, "vec_id", "embedding"),
        ),
        5,
    ).select("id_a", "id_b", "cosine").persist()

    def _recall(truth, approx) -> float | None:
        n = truth.count()
        if not n:
            return None
        hit = (
            truth.join(
                approx.filter(F.col("id_a").isin(qids)).select("id_a", "id_b"),
                ["id_a", "id_b"],
                "left_semi",
            ).count()
        )
        return round(hit / n, 5)

    # two regimes: generic top-5 over (mostly unclustered) synthetic
    # vectors — intrinsically LSH-hostile — and the near-dup regime
    # (true neighbors at cosine >= 0.95, the regime the dedupe engine
    # actually uses ANN for). The corpus has NO natural cos>=0.95 pairs
    # (max background ~0.5), so filtering the truth sample produced an
    # EMPTY set and a null gate in every round through r3 — plant
    # perturbed copies instead: copy = 0.9*v + 0.1*reverse(v) lands at
    # cos ~0.99 (genuinely probabilistic per bucket bit, unlike an
    # exact copy which shares every bucket by construction), truth =
    # the planted pairs whose TRUE cosine clears the threshold, recall
    # = the fraction embedding_neardup_pairs recovers
    from lieu_spark.operators.ann import embedding_neardup_pairs

    plant_off = 10_000_000
    n_plant = min(500, n_emb)
    base_p = emb.orderBy(F.col("vec_id").asc()).limit(n_plant)
    pert = F.zip_with(
        "embedding",
        F.reverse("embedding"),
        lambda a, b: (a * F.lit(0.9) + b * F.lit(0.1)).cast("float"),
    )
    planted = base_p.select(
        (F.col("vec_id") + F.lit(plant_off)).alias("vec_id"),
        pert.alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted).persist()
    truth_pl = (
        _pair_cosine(
            _with_norm(base_p.select("vec_id", "embedding"), "vec_id", "embedding"),
            _with_norm(planted, "vec_id", "embedding"),
        )
        .filter(
            (F.col("id_b") - F.col("id_a") == plant_off)
            & (F.col("cosine") >= 0.95)
        )
        .select("id_a", "id_b")
        .persist()
    )
    n_truth_nd = truth_pl.count()
    nd_found = truth_pl.join(
        embedding_neardup_pairs(aug, threshold=0.95, nbits=8, ntables=8)
        .select("id_a", "id_b"),
        ["id_a", "id_b"],
        "left_semi",
    ).count()
    nd_recall = round(nd_found / n_truth_nd, 5) if n_truth_nd else None
    aug.unpersist()
    truth_pl.unpersist()
    # multi-probe at the same candidate budget as the single-probe
    # default but HALF the stored tables (measured frontier, BENCH.md)
    from lieu_spark.operators.ann import hyperplane_multiprobe_topk

    mp_topk = hyperplane_multiprobe_topk(emb, k=5, nbits=8, ntables=8, nprobes=8)
    ann_recall = {
        "lsh_recall_at_5": _recall(truth_topk, lsh_topk),
        "ivf_recall_at_5": _recall(truth_topk, ivf),
        "lsh_neardup_recall": nd_recall,
        "lsh_neardup_truth_pairs": n_truth_nd,
        "mp_recall_at_5": _recall(truth_topk, mp_topk),
    }
    truth_topk.unpersist()
    lsh_topk.unpersist()
    ivf.unpersist()

    # streaming<->batch parity at bench scale (headline run only): the
    # corpus arrives as 3 deterministic chunks of complete conversations
    # through the foreachBatch incremental path; connected components
    # over the accumulated stream pairs must equal the batch clusters
    # byte-for-byte (VERDICT r1 #9)
    stream_equal = None
    stream_batch_walls = None
    stream_match_walls = None
    stream_fold_walls = None
    if stream_parity:
        import shutil as _sh

        from lieu_spark.operators.cluster import (
            clusters_with_singletons,
            connected_components,
        )
        from lieu_spark.streaming.ingest import run_stream

        sp_root = CACHE / f"stream_parity_{cores}"
        if sp_root.exists():
            _sh.rmtree(sp_root)
        in_dir = sp_root / "in"
        in_dir.mkdir(parents=True)
        # pmod, never abs(...)%: abs(Long.MIN_VALUE) overflows (ANSI
        # throw / non-ANSI negative remainder matching no chunk) — same
        # rule run_refresh_probe applies
        chunk = F.pmod(F.xxhash64("conv_id"), F.lit(3)).alias("chunk")
        for c in range(3):
            tdf.withColumn("chunk", chunk).filter(F.col("chunk") == c).drop(
                "chunk"
            ).coalesce(1).write.mode("append").parquet(str(in_dir))
        # timer starts AFTER input staging: fabricating the 3 arrival
        # chunks (3 corpus scans through single-task writes) is test
        # fixture setup, not the system under test — the batch headline
        # likewise starts with its corpus already on disk. The timed
        # window is run_stream (ingest+match+fold) + the parity check.
        t3 = time.time()
        run_stream(
            spark, str(in_dir), str(sp_root / "work"), cfg,
            available_now=True, files_per_trigger=1,
            metrics_dir=str(sp_root / "metrics"),
        )
        # per-batch walls: with the incremental band-table fold these
        # must stay roughly FLAT as the index grows (batch 1 -> 3); the
        # pre-r3 O(index)-per-batch re-band made them climb
        from lieu_spark.metrics import read_metrics

        metrics_df = read_metrics(spark, str(sp_root / "metrics")).persist()

        def _batch_walls(prefix: str) -> list[float]:
            rows = (
                metrics_df.filter(F.col("stage").startswith(prefix))
                .select("stage", "wall_sec")
                .distinct()
                .collect()
            )
            by_batch = {
                int(r.stage.rsplit("batch", 1)[1]): r.wall_sec for r in rows
            }
            return [round(by_batch[b], 3) for b in sorted(by_batch)]

        stream_batch_walls = _batch_walls("stream_features@batch")
        # sub-stage attribution (ingest.process_batch): match = the
        # verify chain up to the pairs write; fold = the per-batch
        # fixed cost of the three state folds. Diagnoses a wall
        # inflation from the artifact alone (r3 driver-run flag).
        stream_match_walls = _batch_walls("stream_match@batch")
        stream_fold_walls = _batch_walls("stream_fold@batch")
        metrics_df.unpersist()
        t_check = time.time()
        stream_ingest_wall = round(t_check - t3, 3)
        stream_pairs = dupe_pairs(spark.read.parquet(str(sp_root / "work/pairs")))
        sc_df = clusters_with_singletons(
            res.conversations, connected_components(stream_pairs)
        ).select("conv_id", "cluster_id")
        bc_df = res.clusters.select("conv_id", "cluster_id")
        stream_equal = (
            sc_df.exceptAll(bc_df).count() == 0
            and bc_df.exceptAll(sc_df).count() == 0
        )
        timings["stream_parity"] = time.time() - t3
        # the parity CC + two exceptAll passes are the CHECK, not the
        # system under test — split out so the ingest wall is readable
        timings["stream_parity_check"] = time.time() - t_check
        timings["stream_ingest"] = stream_ingest_wall

    spark.stop()
    payload = {
        "cores": cores,
        "range_wall_sec": range_wall,
        "pipeline_wall_sec": wall,
        "turns": n_turns,
        "turns_per_sec": n_turns / wall if wall > 0 else 0.0,
        "verified_pairs": n_pairs,
        "candidate_pairs": n_candidates,
        "possible_pairs": n_docs * (n_docs - 1) // 2,
        "blocking_ratio": round(
            n_candidates / max(1, n_docs * (n_docs - 1) // 2), 8
        ),
        "clusters": n_clusters,
        "dup_pair_recall": round(recall, 5),
        "true_dup_pairs": n_should,
        "found_dup_pairs": n_found,
        "doc_dedupe_pairs": doc_pairs,
        "ann_rows": ann,
        "ann_recall": ann_recall,
        "stream_parity_equal": stream_equal,
        "stream_batches": 3 if stream_parity else None,
        "stream_batch_walls": stream_batch_walls,
        "stream_match_walls": stream_match_walls,
        "stream_fold_walls": stream_fold_walls,
        "mode": "store" if store_dir else "eager",
        "stage_sec": {k: round(v, 3) for k, v in timings.items()},
    }
    Path(out_json).write_text(json.dumps(payload))


def run_refresh_probe(cores: int, corpus_parquet: str, out_json: str) -> None:
    """Committed evidence for the incremental-refresh story: snapshot 1
    -> stage store (setup, excluded from the ratio), a deterministic
    ~4% conv-atomic CDC delta -> snapshot 2, then FROM-SCRATCH vs
    refresh_pipeline timed ADJACENTLY in this process — same co-tenant
    window, both arms on the JVM the setup run warmed — with a full
    cluster-set parity check (the test_refresh invariant, re-asserted
    at bench scale). Spans off in both arms: refresh maintains
    features/bands/verified/clusters, so that is the like-for-like."""
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from lieu_spark.checkpoint import StageStore
    from lieu_spark.config import DedupeConfig
    from lieu_spark.operators.refresh import refresh_pipeline
    from lieu_spark.pipeline import run_pipeline
    from lieu_spark.session import build_session

    cfg = DedupeConfig()
    spark = build_session(f"lieu_spark_refresh_probe_{cores}", cores=cores)
    t = spark.read.parquet(corpus_parquet)

    store_dir = Path(out_json).with_suffix(".store")
    shutil.rmtree(store_dir, ignore_errors=True)
    store = StageStore(str(store_dir))
    t0 = time.time()
    run_pipeline(spark, t, cfg, store=store, with_spans=False)
    setup_wall = time.time() - t0

    # snapshot 2: ~1% each removed / changed / renamed / added, all
    # conv-atomic (hash on conv_id, never turn-level divergence)
    h = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(101))
    edited = t.filter(h != 7).select(
        F.when(h == 5, F.concat(F.lit("r-"), F.col("conv_id")))
        .otherwise(F.col("conv_id"))
        .alias("conv_id"),
        "turn_idx",
        "role",
        F.when(
            (h == 3) & (F.col("turn_idx") == 0),
            F.concat(F.col("text"), F.lit(" refreshed suffix qq")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "tool",
        "ts",
    )
    added = t.filter(h == 11).select(
        F.concat(F.lit("n-"), F.col("conv_id")).alias("conv_id"),
        "turn_idx",
        "role",
        F.concat(F.col("text"), F.lit(" novel zz yy")).alias("text"),
        "tool",
        "ts",
    )
    snap2_path = Path(out_json).with_suffix(".snap2.parquet")
    edited.unionByName(added).write.mode("overwrite").parquet(str(snap2_path))
    snap2 = spark.read.parquet(str(snap2_path))
    n_turns = snap2.count()

    t0 = time.time()
    res = run_pipeline(spark, snap2, cfg, with_spans=False)
    scratch_rows = res.clusters.select("conv_id", "cluster_id").collect()
    scratch_wall = time.time() - t0

    t0 = time.time()
    ref = refresh_pipeline(spark, store, snap2, cfg)
    refresh_rows = ref.clusters.select("conv_id", "cluster_id").collect()
    refresh_wall = time.time() - t0
    n_delta = ref.delta.count()

    def canon(rows):
        groups: dict = {}
        for r in rows:
            groups.setdefault(r["cluster_id"], set()).add(r["conv_id"])
        return {frozenset(v) for v in groups.values()}

    clusters_equal = canon(scratch_rows) == canon(refresh_rows)
    spark.stop()
    shutil.rmtree(store_dir, ignore_errors=True)
    shutil.rmtree(snap2_path, ignore_errors=True)
    Path(out_json).write_text(
        json.dumps(
            {
                "cores": cores,
                "turns": n_turns,
                "setup_wall_sec": round(setup_wall, 3),
                "scratch_wall_sec": round(scratch_wall, 3),
                "refresh_wall_sec": round(refresh_wall, 3),
                "refresh_speedup": round(scratch_wall / refresh_wall, 3)
                if refresh_wall
                else None,
                "delta_rows": n_delta,
                "clusters_equal": clusters_equal,
            }
        )
    )


def run_stateful_probe(
    cores: int, sf_dir: str, corpus_parquet: str, out_json: str
) -> None:
    """§2.9 measured-beyond-parity evidence (VERDICT r4 #8): the two
    pytest-only streaming surfaces get bench-scale numbers.

    Arm 1 — applyInPandasWithState conversation assembly
    (streaming/stateful.py): a ~5% conv slice of the bench corpus,
    turn rows split across 4 landing files (cross-batch state), drained
    availableNow with a far-future flush sentinel. Reports wall,
    turns/sec, peak state rows, watermark-dropped rows, and sha parity
    vs the batch assembler over the same rows.

    Arm 2 — watermarked tumbling-window aggregation
    (streaming/windows.py): the sf events table streamed from 4 files
    plus a sentinel event that pushes the watermark past every real
    window. Reports wall, emitted windows, state metrics, and row-set
    parity vs the batch groupBy over the same events."""
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from lieu_spark.operators.assemble import assemble_conversations
    from lieu_spark.session import build_session
    from lieu_spark.streaming.stateful import assemble_stream
    from lieu_spark.streaming.windows import stream_events, windowed_event_counts

    spark = build_session(f"lieu_spark_stateful_probe_{cores}", cores=cores)
    root = Path(out_json).with_suffix(".work")
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)

    def _state_metrics(progresses):
        peak_rows, dropped = 0, 0
        for p in progresses:
            for op in (p or {}).get("stateOperators", []):
                peak_rows = max(peak_rows, op.get("numRowsTotal", 0) or 0)
                dropped += op.get("numRowsDroppedByWatermark", 0) or 0
        return peak_rows, dropped

    # ---- arm 1: stateful assembly ----
    t = spark.read.parquet(corpus_parquet)
    sel = t.filter(F.pmod(F.xxhash64("conv_id"), F.lit(20)) == 0).persist()
    n_turns = sel.count()
    max_ts = sel.agg(F.max("ts")).collect()[0][0]
    in1 = root / "turns"
    # landing files follow EVENT TIME (a real feed's arrival order):
    # ts-quartile ranges, written in order so the file source's
    # modified-time ordering replays them as an in-order stream — a
    # conversation straddling a quartile boundary exercises cross-batch
    # state, and the 1-minute watermark drops nothing (out-of-order
    # delivery beyond the watermark is out of the feed contract)
    epoch = sel.withColumn("_e", F.col("ts").cast("double"))
    q1, q2, q3 = epoch.approxQuantile("_e", [0.25, 0.5, 0.75], 0.01)
    bounds = [None, q1, q2, q3, None]
    for i in range(4):
        part = epoch
        if bounds[i] is not None:
            part = part.filter(F.col("_e") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("_e") < bounds[i + 1])
        part.drop("_e").coalesce(1).write.mode("overwrite").parquet(
            str(in1 / f"b{i}")
        )
    flush = sel.limit(1).select(
        F.lit("zzflush").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("flush").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit(max_ts) + F.expr("INTERVAL 6 HOURS")).alias("ts"),
    )
    flush.coalesce(1).write.mode("overwrite").parquet(str(in1 / "b9"))

    stream = (
        spark.readStream.schema(t.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in1) + "/*")
    )
    t0 = time.time()
    q = (
        assemble_stream(stream, watermark="1 minute", gap_ms=60_000)
        .writeStream.format("parquet")
        .option("path", str(root / "out1"))
        .option("checkpointLocation", str(root / "ck1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assemble_wall = time.time() - t0
    peak1, dropped1 = _state_metrics([p for p in q.recentProgress])

    got = spark.read.parquet(str(root / "out1")).select("conv_id", "text_sha")
    want = assemble_conversations(sel).select(
        "conv_id", F.col("text_sha").alias("want_sha")
    )
    n_convs = want.count()
    n_match = (
        got.join(want, "conv_id")
        .filter(F.col("text_sha") == F.col("want_sha"))
        .count()
    )
    sel.unpersist()

    # ---- arm 2: watermarked windows ----
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev_cols = ["event_id", "user_id", "event_type", "ts", "props"]
    ev = ev.select(*[c for c in ev_cols if c in ev.columns])
    n_events = ev.count()
    ev_max = ev.agg(F.max("ts")).collect()[0][0]
    in2 = root / "events"
    ev.repartition(4).write.mode("overwrite").parquet(str(in2 / "b0"))
    def _sentinel_col(c):
        if c == "ts":
            return (F.lit(ev_max) + F.expr("INTERVAL 365 DAYS")).alias(c)
        if c == "event_type":
            return F.lit("zzsentinel").alias(c)
        return F.lit(None).cast(ev.schema[c].dataType).alias(c)

    ev.limit(1).select(*[_sentinel_col(c) for c in ev.columns]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(in2 / "b1"))

    t0 = time.time()
    counts = windowed_event_counts(
        stream_events(spark, str(in2) + "/*"), window="1 hour", watermark="2 hours"
    )
    q2 = (
        counts.writeStream.format("parquet")
        .option("path", str(root / "out2"))
        .option("checkpointLocation", str(root / "ck2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    windows_wall = time.time() - t0
    peak2, dropped2 = _state_metrics([p for p in q2.recentProgress])

    stream_rows = {
        tuple(r)
        for r in spark.read.parquet(str(root / "out2"))
        .filter(F.col("event_type") != "zzsentinel")
        .collect()
    }
    batch_rows = {tuple(r) for r in windowed_event_counts(ev).collect()}
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    Path(out_json).write_text(
        json.dumps(
            {
                "cores": cores,
                "assemble_turns": n_turns,
                "assemble_convs": n_convs,
                "assemble_wall_sec": round(assemble_wall, 3),
                "assemble_turns_per_sec": round(n_turns / assemble_wall, 1)
                if assemble_wall
                else None,
                "assemble_sha_parity": n_match == n_convs,
                "assemble_state_rows_peak": peak1,
                "assemble_watermark_dropped": dropped1,
                "windows_events": n_events,
                "windows_wall_sec": round(windows_wall, 3),
                "windows_emitted": len(stream_rows),
                "windows_parity": stream_rows == batch_rows,
                "windows_state_rows_peak": peak2,
                "windows_watermark_dropped": dropped2,
            }
        )
    )


def submit(
    cores: int,
    sf_dir: str,
    corpus_parquet: str,
    out_json: str,
    repeats: int = 1,
    stream_parity: bool = False,
    verify_mode: str = "shingles",
    pipeline_only: bool = False,
    refresh_probe: bool = False,
    stateful_probe: bool = False,
) -> dict:
    """Launch one measured run via spark-submit --py-files (falls back to
    plain python if spark-submit is unavailable). repeats>1: rerun and
    keep the fastest wall (shared-VM co-tenant noise is 1.5x+ run to
    run; min-of-k is the standard estimator for contended boxes)."""
    if repeats > 1:
        # forward EVERY variant kwarg: dropping them would rerun the
        # default shingles full run and label it as the caller's arm
        runs = [
            submit(
                cores,
                sf_dir,
                corpus_parquet,
                f"{out_json}.{i}",
                repeats=1,
                stream_parity=stream_parity,
                verify_mode=verify_mode,
                pipeline_only=pipeline_only,
                refresh_probe=refresh_probe,
                stateful_probe=stateful_probe,
            )
            for i in range(repeats)
        ]
        best = min(runs, key=lambda r: r["pipeline_wall_sec"])
        Path(out_json).write_text(json.dumps(best))
        return best
    pyfiles = str(CACHE / "lieu_spark.zip")
    src_mtime = max(p.stat().st_mtime for p in (REPO / "lieu_spark").rglob("*.py"))
    if not Path(pyfiles).exists() or Path(pyfiles).stat().st_mtime < src_mtime:
        CACHE.mkdir(exist_ok=True)
        shutil.make_archive(pyfiles[:-4], "zip", REPO, "lieu_spark")
    mode = "--run-one"
    if refresh_probe:
        mode = "--refresh-probe"
    elif stateful_probe:
        mode = "--stateful-probe"
    args = [
        str(REPO / "bench.py"),
        mode,
        "--cores", str(cores),
        "--sf-dir", sf_dir,
        "--corpus", corpus_parquet,
        "--out", out_json,
        "--verify-mode", verify_mode,
    ]
    if stream_parity:
        args.append("--stream-parity")
    if pipeline_only:
        args.append("--pipeline-only")
    spark_submit = shutil.which("spark-submit")
    if spark_submit:
        cmd = [
            spark_submit,
            "--master", f"local[{cores}]",
            "--py-files", pyfiles,
            # driver memory must be set at JVM launch — the in-code
            # builder setting is too late under spark-submit
            "--driver-memory", os.environ.get("LIEU_SPARK_DRIVER_MEM", "8g"),
            "--conf", "spark.ui.enabled=false",
        ] + args
    else:
        cmd = [sys.executable] + args
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench subprocess (cores={cores}) failed")
    return json.loads(Path(out_json).read_text())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-one", action="store_true")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-convs", type=int, default=None)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--stream-parity", action="store_true")
    ap.add_argument("--verify-mode", default="shingles")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--store-dir", default=None)
    ap.add_argument("--refresh-probe", action="store_true")
    ap.add_argument("--stateful-probe", action="store_true")
    args = ap.parse_args()

    if args.refresh_probe:
        run_refresh_probe(args.cores, args.corpus, args.out)
        return
    if args.stateful_probe:
        run_stateful_probe(args.cores, args.sf_dir, args.corpus, args.out)
        return
    if args.run_one:
        run_one(
            args.cores, args.sf_dir, args.corpus, args.out,
            stream_parity=args.stream_parity,
            verify_mode=args.verify_mode,
            pipeline_only=args.pipeline_only,
            store_dir=args.store_dir,
        )
        return

    sf = sf_of(args.sf_dir)
    n_convs = args.n_convs or int(
        os.environ.get("SPARK_GRAFT_BENCH_CONVS", max(500, int(900000 * sf)))
    )
    corpus_parquet = str(ensure_corpus(sf, n_convs))

    native = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # scaling pair: N vs 4N threads BOTH inside this box's memory-
    # bandwidth envelope (~8-12 effective cores for string/array work —
    # measured in BENCH.md). local[2] -> local[8] models adding cluster
    # nodes (each node brings its own bus); local[32] is the headline
    # throughput config.
    p1 = int(os.environ.get("SPARK_GRAFT_BENCH_P1", "2"))
    p2 = int(os.environ.get("SPARK_GRAFT_BENCH_P2", "8"))
    CACHE.mkdir(exist_ok=True)

    # headline run carries the streaming-parity stage (separate process,
    # so the interleaved scaling pairs below stay uncontaminated).
    # Runs unconditionally — on a box where native == p2 the old skip
    # silently reported stream_parity_equal: null (round-2 advisory)
    r2 = submit(
        native, args.sf_dir, corpus_parquet,
        str(CACHE / f"run_p{native}.json"), stream_parity=True,
    )

    # incremental-refresh probe MOVED BEFORE the scaling/AB workloads
    # (VERDICT r4 #6): at the old bench-tail position the refresh arm —
    # a serial chain of short jobs — inflated super-linearly under the
    # accumulated co-tenant load and reported sub-1.0 ratios that three
    # adjacent standalone probes (1.17-1.33x) and the 10x ladder
    # (2.05-3.01x, BENCH.md) contradicted. ~2-3 min;
    # SPARK_GRAFT_BENCH_REFRESH=0 opts out.
    refresh_probe = None
    if os.environ.get("SPARK_GRAFT_BENCH_REFRESH", "1") == "1":
        refresh_probe = submit(
            native, args.sf_dir, corpus_parquet,
            str(CACHE / "run_refresh_probe.json"), refresh_probe=True,
        )
        refresh_probe["load_caveat"] = (
            "refresh arm is a serial chain of short jobs; under co-tenant "
            "load the ratio is noise-level at 1x scale — the measured "
            "scale curve is BENCH.md's refresh ladder (2k 0.89x, 90k "
            "~1.3x, 900k 2.05-3.01x, clusters_equal at every rung)"
        )

    # §2.9 stateful/windowed streaming probe (VERDICT r4 #8): measured
    # numbers beyond pytest parity. SPARK_GRAFT_BENCH_STATEFUL=0 opts
    # out.
    stateful_probe = None
    if os.environ.get("SPARK_GRAFT_BENCH_STATEFUL", "1") == "1":
        stateful_probe = submit(
            native, args.sf_dir, corpus_parquet,
            str(CACHE / "run_stateful_probe.json"), stateful_probe=True,
        )
    # 3 rounds, not 2: the headline weak_efficiency is the MEDIAN of
    # 5 weak rounds: a 2-element median degenerates to the min, and
    # co-tenant spikes SHORTER than a round blow individual ratios both
    # ways (adjacent-round spread 0.63->2.30 observed under heavy load),
    # so the weak pair runs tight back-to-back rounds with nothing
    # between pair members; the 90 s strong-scaling partner moved OUT of
    # the weak round (it only added drift exposure between weak pairs)
    # into its own interleaved (p1-full, p2-full) pair below.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5"))
    scaling = None
    if not args.skip_scaling:
        # weak-scaling pair INTERLEAVED (p2-full, p1-quarter, repeat):
        # co-tenant load drifts over minutes on this shared VM, so
        # alternating keeps both levels under the same conditions — a
        # ratio is only as good as its simultaneity
        quarter = str(ensure_corpus(sf / (p2 // p1), max(100, n_convs * p1 // p2)))
        p2_runs, w_runs, s1_runs = [], [], []
        for i in range(max(1, reps)):
            # pipeline_only: main() consumes only the pipeline-region
            # fields from scaling runs, and the pipeline_only payload
            # carries all of them — the recall/ANN secondary workloads
            # were minutes of dead wall per run x ~14 runs per bench
            p2_runs.append(
                submit(p2, args.sf_dir, corpus_parquet, str(CACHE / f"run_s{p2}.json.{i}"), pipeline_only=True)
            )
            w_runs.append(
                submit(p1, args.sf_dir, quarter, str(CACHE / f"run_w{p1}.json.{i}"), pipeline_only=True)
            )
        # strong-scaling pair: its OWN interleave (p1-full, p2-full) x 2
        # with per-round ratios — the measurement-discipline rule (never
        # a sequential A/B) applies to the strong numbers too; the p2
        # runs here are adjacent to their p1 partners, unlike the weak
        # loop's p2 runs which belong to a different window
        s2_runs = []
        strong_reps = int(os.environ.get("SPARK_GRAFT_BENCH_STRONG_REPEATS", "2"))
        for i in range(strong_reps):
            s1_runs.append(
                submit(p1, args.sf_dir, corpus_parquet, str(CACHE / f"run_s{p1}.json.{i}"), pipeline_only=True)
            )
            s2_runs.append(
                submit(p2, args.sf_dir, corpus_parquet, str(CACHE / f"run_s{p2}s.json.{i}"), pipeline_only=True)
            )
        strong_ratios = [
            round(b["turns_per_sec"] / a["turns_per_sec"], 3)
            for a, b in zip(s1_runs, s2_runs)
            if a["turns_per_sec"]
        ]
        hw_ratios = [
            round(a["range_wall_sec"] / b["range_wall_sec"], 3)
            for a, b in zip(s1_runs, s2_runs)
            if b["range_wall_sec"]
        ]
        rp2 = min(p2_runs + s2_runs, key=lambda r: r["pipeline_wall_sec"])
        rw = min(w_runs, key=lambda r: r["pipeline_wall_sec"])
        # STRONG_REPEATS=0 opts out of the strong pair: no s1 runs, so
        # the p1-side fields degrade to None instead of a ValueError
        # that would lose the whole bench after the weak phase
        r1 = (
            min(s1_runs, key=lambda r: r["pipeline_wall_sec"])
            if s1_runs
            else None
        )
        # weak efficiency per interleave ROUND (adjacent runs see the
        # same co-tenant conditions); the headline is the MEDIAN round
        # (per the round-1 advisory), robust to 2-of-5 spiked rounds;
        # cross-min (each level's best window — the noise-floor
        # estimator for one-sided noise) stays as a supplementary field
        weak_ratios = [
            round(p["turns_per_sec"] / ((p2 // p1) * w["turns_per_sec"]), 3)
            for p, w in zip(p2_runs, w_runs)
            if w["turns_per_sec"]
        ]
    if not args.skip_scaling:
        # strong numbers from the interleaved strong pair's per-round
        # ratios (median), not cross-window minima
        speedup = (
            sorted(strong_ratios)[(len(strong_ratios) - 1) // 2]
            if strong_ratios
            else 0
        )
        hw_speedup = (
            sorted(hw_ratios)[(len(hw_ratios) - 1) // 2] if hw_ratios else 0
        )
        scaling = {
            "p1_cores": p1,
            "p1_wall_sec": round(r1["pipeline_wall_sec"], 2) if r1 else None,
            "p1_turns_per_sec": round(r1["turns_per_sec"], 1) if r1 else None,
            "p2_cores": p2,
            "p2_wall_sec": round(rp2["pipeline_wall_sec"], 2),
            "p2_turns_per_sec": round(rp2["turns_per_sec"], 1),
            "speedup": round(speedup, 3),
            "speedup_rounds": strong_ratios,
            "efficiency": round(speedup / (p2 / p1), 3),
            # this single-node box's own thread-scaling ceiling, measured
            # with a pure-codegen job: shared memory bus + clock budget
            "hw_ceiling_speedup": round(hw_speedup, 3),
            "hw_ceiling_efficiency": round(hw_speedup / (p2 / p1), 3),
            # engine coordination efficiency vs what the hardware allows —
            # the N->4N cluster analog where each node brings its own bus
            "efficiency_vs_hw_ceiling": round(
                speedup / hw_speedup if hw_speedup else 0, 3
            ),
            # weak scaling: P1 cores on P1/P2-sized data vs P2 on full —
            # per-core work constant; efficiency = thr_p2 / (ratio*thr_w1)
            "weak_p1_turns": rw["turns"],
            "weak_p1_wall_sec": round(rw["pipeline_wall_sec"], 2),
            "weak_p1_turns_per_sec": round(rw["turns_per_sec"], 1),
            # headline = MEDIAN of per-round ratios: max() would select
            # exactly the round where co-tenant load hit only the
            # p1-quarter run, biasing the >=0.8 gate upward; median is
            # robust to one contaminated round in either direction
            "weak_efficiency": sorted(weak_ratios)[(len(weak_ratios) - 1) // 2]
            if weak_ratios
            else 0,
            "weak_efficiency_max": max(weak_ratios) if weak_ratios else 0,
            "weak_efficiency_rounds": weak_ratios,
            "weak_efficiency_cross_min": round(
                rp2["turns_per_sec"] / ((p2 // p1) * rw["turns_per_sec"])
                if rw["turns_per_sec"]
                else 0,
                3,
            ),
        }

    # soft-TFIDF verify-mode cost at full corpus scale (r2 verdict #5):
    # interleaved A/B in separate processes (measurement discipline —
    # never a sequential A/B on this box), pipeline-only arms,
    # min-per-variant
    # OPT-IN since r4 (was on by default): the A/B arm added ~8-12 min
    # of wall the driver's shared budget needs for the 68-query
    # correctness sweep; the r3 cost numbers stand in BENCH.md
    soft_ab = None
    if os.environ.get("SPARK_GRAFT_BENCH_SOFT_AB", "0") == "1":
        ab_reps = int(os.environ.get("SPARK_GRAFT_BENCH_AB_REPEATS", "2"))
        sh_runs, so_runs = [], []
        for i in range(ab_reps):
            sh_runs.append(submit(
                native, args.sf_dir, corpus_parquet,
                str(CACHE / f"run_ab_shingles.json.{i}"), pipeline_only=True,
            ))
            so_runs.append(submit(
                native, args.sf_dir, corpus_parquet,
                str(CACHE / f"run_ab_soft.json.{i}"),
                verify_mode="soft_tfidf", pipeline_only=True,
            ))
        sh = min(r["pipeline_wall_sec"] for r in sh_runs)
        so = min(r["pipeline_wall_sec"] for r in so_runs)
        soft_ab = {
            "shingles_wall_sec": round(sh, 3),
            "soft_tfidf_wall_sec": round(so, 3),
            "soft_over_shingles": round(so / sh, 3) if sh else None,
            "rounds": [
                {
                    "shingles": round(a["pipeline_wall_sec"], 3),
                    "soft_tfidf": round(b["pipeline_wall_sec"], 3),
                }
                for a, b in zip(sh_runs, so_runs)
            ],
        }

    queries = {"pipeline_total": round(r2["pipeline_wall_sec"], 3)}
    queries.update({k: round(v, 3) for k, v in r2["stage_sec"].items()})
    out = {
        "metric": "transcript_dedupe_wall",
        "value": round(r2["pipeline_wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "turns": r2["turns"],
        "turns_per_sec": round(r2["turns_per_sec"], 1),
        "verified_pairs": r2["verified_pairs"],
        "candidate_pairs": r2.get("candidate_pairs"),
        "possible_pairs": r2.get("possible_pairs"),
        "blocking_ratio": r2.get("blocking_ratio"),
        "clusters": r2["clusters"],
        "dup_pair_recall": r2.get("dup_pair_recall"),
        "true_dup_pairs": r2.get("true_dup_pairs"),
        "stream_parity_equal": r2.get("stream_parity_equal"),
        "stream_batches": r2.get("stream_batches"),
        "stream_batch_walls": r2.get("stream_batch_walls"),
        "stream_match_walls": r2.get("stream_match_walls"),
        "stream_fold_walls": r2.get("stream_fold_walls"),
        "ann_recall": r2.get("ann_recall"),
        "verify_mode_ab": soft_ab,
        "refresh_probe": refresh_probe,
        "stateful_probe": stateful_probe,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
