#!/usr/bin/env python3
"""spark-submit entrypoint for the transcript dedupe pipeline.

Packaging (north-rule shape; reference analog: mrjob-launched Spark job,
/root/reference/scripts/jobs/dedupe_geojson.py):

    cd /root/repo && zip -r /tmp/lieu_spark.zip lieu_spark
    spark-submit \
      --master <cluster-or-local[N]> \
      --py-files /tmp/lieu_spark.zip \
      jobs/run_dedupe.py \
      --input  /path/to/transcripts(.parquet | iceberg table) \
      --output /path/to/output_dir \
      --checkpoint-dir /path/to/stages \
      [--metrics-dir DIR] [--shingle-k 5] [--threshold 0.9]
      [--no-spans] [--verify-mode shingles|signatures]

Outputs: pairs/, clusters/, spans/, band_stats/ under --output
(parquet here; Iceberg ``writeTo`` when a catalog is configured).
Resume: rerun the same command — completed stages with a matching
config fingerprint are loaded from --checkpoint-dir, not recomputed.
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--metrics-dir", default=None)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--review-threshold", type=float, default=0.7)
    ap.add_argument("--verify-mode", choices=["shingles", "signatures", "soft_tfidf"], default="shingles")
    ap.add_argument("--no-spans", action="store_true")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()


    from lieu_spark.checkpoint import StageStore
    from lieu_spark.config import DedupeConfig
    from lieu_spark.pipeline import run_pipeline

    from lieu_spark.session import attach_session

    spark = attach_session("lieu_spark_dedupe")

    cfg = DedupeConfig(
        shingle_k=args.shingle_k,
        threshold_likely=args.threshold,
        threshold_review=args.review_threshold,
        verify_mode=args.verify_mode,
    )
    transcripts = spark.read.parquet(args.input)
    store = StageStore(args.checkpoint_dir) if args.checkpoint_dir else None
    metrics_dir = args.metrics_dir or (
        os.path.join(args.output, "metrics") if args.output else None
    )

    t0 = time.time()
    res = run_pipeline(
        spark,
        transcripts,
        cfg,
        store=store,
        metrics_dir=metrics_dir,
        run_id=args.run_id,
        with_spans=not args.no_spans,
    )
    res.verified.write.mode("overwrite").parquet(os.path.join(args.output, "pairs"))
    res.clusters.write.mode("overwrite").parquet(os.path.join(args.output, "clusters"))
    if not args.no_spans:
        res.spans.write.mode("overwrite").parquet(os.path.join(args.output, "spans"))
    res.band_stats.write.mode("overwrite").parquet(
        os.path.join(args.output, "band_stats")
    )
    summary = {
        "run_id": res.run_id,
        "wall_sec": round(time.time() - t0, 2),
        "pairs": res.verified.count(),
        "clusters": res.clusters.select("cluster_id").distinct().count(),
        "stage_wall": {k: round(v, 2) for k, v in res.stage_wall.items()},
        "config_fingerprint": cfg.fingerprint(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
