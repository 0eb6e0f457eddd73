#!/usr/bin/env python3
"""spark-submit entrypoint for match mode: dedupe an INCOMING batch of
transcripts against a CANONICAL corpus without re-pairing the canonical
set with itself — the reference's ``AddressDeduperSpark.match`` workflow
(/root/reference/lib/lieu/spark/dedupe.py:24-48, "ingest against index").

    spark-submit --master <...> --py-files /tmp/lieu_spark.zip \
      jobs/run_match.py \
      --canonical /path/to/canonical_transcripts.parquet \
      --incoming  /path/to/incoming_transcripts.parquet \
      --output    /path/to/output_dir

Outputs under --output:
    matches/  (canonical_id, incoming_id, jaccard, is_exact, status, method)
    unique/   incoming conv_ids with no canonical duplicate (the rows an
              ingestion pipeline appends to the canonical corpus)
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
    ap.add_argument("--canonical", required=True)
    ap.add_argument("--incoming", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--verify-mode", choices=["shingles", "signatures", "soft_tfidf"], default="shingles")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lieu_spark.api import match
    from lieu_spark.config import DedupeConfig

    from lieu_spark.session import attach_session

    spark = attach_session("lieu_spark_match")

    cfg = DedupeConfig(
        shingle_k=args.shingle_k,
        threshold_likely=args.threshold,
        verify_mode=args.verify_mode,
    )
    canonical = spark.read.parquet(args.canonical)
    incoming = spark.read.parquet(args.incoming)

    t0 = time.time()
    matches_path = os.path.join(args.output, "matches")
    unique_path = os.path.join(args.output, "unique")
    match(spark, canonical, incoming, cfg).write.mode("overwrite").parquet(
        matches_path
    )

    # read the written parquet back rather than re-running the match
    # pipeline: deriving unique/ and the summary counts from the live
    # plan would recompute assembly+features+banding+verification twice
    # more (~3x job wall for two counters)
    matches = spark.read.parquet(matches_path)
    matched_ids = matches.filter(
        F.col("status").isin("exact_duplicate", "likely_duplicate")
    ).select(F.col("incoming_id").alias("conv_id"))
    uniq = incoming.select("conv_id").distinct().join(
        matched_ids, "conv_id", "left_anti"
    )
    uniq.write.mode("overwrite").parquet(unique_path)

    summary = {
        "wall_sec": round(time.time() - t0, 2),
        "matches": matches.count(),
        "unique_incoming": spark.read.parquet(unique_path).count(),
        "config_fingerprint": cfg.fingerprint(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
