#!/usr/bin/env python3
"""spark-submit entrypoint for cross-snapshot dedupe refresh.

Given a previous run's stage store (written by jobs/run_dedupe.py or a
previous run of THIS job) and a NEW snapshot of the corpus, refresh the
dedupe state incrementally — only the delta is re-shingled — and write
a complete state for the next refresh (operators/refresh.py).

    cd /root/repo && zip -r /tmp/lieu_spark.zip lieu_spark
    spark-submit \
      --master <cluster-or-local[N]> \
      --py-files /tmp/lieu_spark.zip \
      jobs/run_refresh.py \
      --state-dir  /path/to/previous/stages \
      --input      /path/to/new_snapshot(.parquet) \
      --output     /path/to/refresh_out \
      [--shingle-k 5] [--threshold 0.9] [--verify-mode shingles]
      [--no-simhash] [--metrics-dir DIR]

Config flags MUST match the run that produced --state-dir (pairs
verified under different thresholds must never merge). Outputs under
--output: clusters/, pairs/, delta/, and stages/ (features, bands,
verified) — pass ``--output/stages`` as the next run's --state-dir to
chain snapshots.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--review-threshold", type=float, default=0.7)
    ap.add_argument(
        "--verify-mode",
        choices=["shingles", "signatures", "soft_tfidf"],
        default="shingles",
    )
    ap.add_argument("--no-simhash", action="store_true")
    ap.add_argument("--metrics-dir", default=None)
    args = ap.parse_args()

    from lieu_spark.checkpoint import StageStore, input_signature
    from lieu_spark.config import DedupeConfig
    from lieu_spark.metrics import record_stages
    from lieu_spark.operators.refresh import refresh_pipeline
    from lieu_spark.session import attach_session

    spark = attach_session("lieu_spark_refresh")
    cfg = DedupeConfig(
        shingle_k=args.shingle_k,
        threshold_likely=args.threshold,
        threshold_review=args.review_threshold,
        verify_mode=args.verify_mode,
        # family toggle is a cfg field so the fingerprint gate catches
        # a --no-simhash refresh of a with-simhash store (and vice
        # versa) instead of silently mixing candidate families
        with_simhash_path=not args.no_simhash,
    )
    t0 = time.time()
    store = StageStore(args.state_dir)
    new_transcripts = spark.read.parquet(args.input)
    res = refresh_pipeline(spark, store, new_transcripts, cfg)

    out = args.output.rstrip("/")
    res.clusters.write.mode("overwrite").parquet(f"{out}/clusters")
    res.verified.write.mode("overwrite").parquet(f"{out}/pairs")
    res.delta.write.mode("overwrite").parquet(f"{out}/delta")
    # next-round state, addressed exactly like run_dedupe's stage store
    fp = cfg.fingerprint()
    sig = input_signature(new_transcripts)
    if sig:
        fp = f"{fp}-in{sig}"
    next_store = StageStore(f"{out}/stages")
    next_store.save(spark, "features", res.features, fp)
    next_store.save(spark, "bands", res.bands, fp)
    # verified/clusters were JUST written above — save the state copies
    # from the written parquet, not from res.* (the result frames are
    # un-checkpointed shallow plans over the old state, so a second
    # write from them re-runs the corpus-scale CDC anti-join/union —
    # the exact once-per-consumer recompute the lineage note below
    # exists to avoid)
    next_store.save(spark, "verified", spark.read.parquet(f"{out}/pairs"), fp)
    # clusters in the chained store keep the NEXT refresh's connected
    # components incremental (affected-subgraph only)
    next_store.save(spark, "clusters", spark.read.parquet(f"{out}/clusters"), fp)

    # Lineage + counts rescan the WRITTEN tables (shallow parquet reads),
    # never the refresh plans — re-running res.* here would recompute the
    # CDC joins once per consumer.
    wall = time.time() - t0
    clusters_w = spark.read.parquet(f"{out}/clusters")
    pairs_w = spark.read.parquet(f"{out}/pairs")
    delta_w = spark.read.parquet(f"{out}/delta")
    metrics_dir = args.metrics_dir or os.path.join(out, "metrics")
    record_stages(
        spark,
        metrics_dir,
        run_id=f"refresh-{int(t0)}",
        entries=[
            ("refresh_clusters", clusters_w, wall),
            ("refresh_pairs", pairs_w, 0.0),
            ("refresh_delta", delta_w, 0.0),
        ],
        fingerprint=fp,
    )

    n_delta = delta_w.count()
    n_clusters = clusters_w.select("cluster_id").distinct().count()
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 1),
                "delta_rows": n_delta,
                "clusters": n_clusters,
                "output": out,
            }
        )
    )


if __name__ == "__main__":
    main()
