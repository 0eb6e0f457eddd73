#!/usr/bin/env python3
"""spark-submit entrypoint for the IMAGE dedup pipeline: binary image
payloads -> perceptual hashes -> near-dup pairs -> connected-component
clusters -> best-quality representatives (+ optional visual
decontamination against an eval set).

Packaging (same north-rule shape as jobs/run_dedupe.py):

    cd /root/repo && zip -r /tmp/lieu_spark.zip lieu_spark
    spark-submit \
      --master <cluster-or-local[N]> \
      --py-files /tmp/lieu_spark.zip \
      jobs/run_media_dedupe.py \
      --input  /path/to/images.parquet      # (doc_id long, payload binary)
      --output /path/to/output_dir \
      [--eval-input /path/to/eval_images.parquet]  # enables decon
      [--metrics-dir DIR] [--hamming-max 6] [--chunks 8]

Outputs under --output: hashes/ pairs/ clusters/ reps/ and, with
--eval-input, kept/ (rows whose cluster REPRESENTATIVE survives visual
decon — dedupe first, then decontaminate the survivors, so one
contaminated copy kills the whole duplicate family). Per-partition
lineage rows go to --metrics-dir via metrics.record_stages, same
schema as the text pipeline's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval-input", default=None)
    ap.add_argument("--metrics-dir", default=None)
    ap.add_argument("--hamming-max", type=int, default=6)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument(
        "--on-error",
        choices=["raise", "quarantine"],
        default="quarantine",
        help="corrupt payloads: fail the stage, or emit format='error' "
        "rows (production default — one bad image must not kill the job)",
    )
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lieu_spark.functions.imagehash import (
        image_decon_keep,
        image_neardup_pairs,
        perceptual_hash_table,
    )
    from lieu_spark.metrics import record_stages
    from lieu_spark.operators.cluster import (
        clusters_with_singletons,
        connected_components,
    )
    from lieu_spark.session import attach_session

    spark = attach_session("lieu_spark_media_dedupe")
    run_id = args.run_id or uuid.uuid4().hex[:12]
    fingerprint = f"hm{args.hamming_max}-c{args.chunks}"
    out = args.output

    t0 = time.time()
    payloads = spark.read.parquet(args.input).repartition(
        max(spark.sparkContext.defaultParallelism, 8)
    )
    hashes = perceptual_hash_table(payloads, on_error=args.on_error).persist()
    hashes.write.mode("overwrite").parquet(os.path.join(out, "hashes"))
    n_quarantined = hashes.filter(F.col("format") == "error").count()
    hashes = hashes.filter(F.col("format") != "error")
    t_hash = time.time()

    pairs = image_neardup_pairs(
        hashes, hamming_max=args.hamming_max, chunks=args.chunks
    )
    pairs.write.mode("overwrite").parquet(os.path.join(out, "pairs"))
    pairs = spark.read.parquet(os.path.join(out, "pairs"))
    t_pairs = time.time()

    comp = connected_components(pairs.select("id_a", "id_b"))
    clusters = clusters_with_singletons(
        hashes.select(F.col("doc_id").alias("conv_id")), comp
    ).select(F.col("conv_id").alias("doc_id"), "cluster_id")
    clusters.write.mode("overwrite").parquet(os.path.join(out, "clusters"))
    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    t_clusters = time.time()

    w = Window.partitionBy("cluster_id").orderBy(
        (F.col("width").cast("long") * F.col("height")).desc(), F.col("doc_id")
    )
    reps = (
        clusters.join(hashes, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    reps.write.mode("overwrite").parquet(os.path.join(out, "reps"))
    reps = spark.read.parquet(os.path.join(out, "reps"))
    t_reps = time.time()

    stages = [
        ("hashes", hashes, t_hash - t0),
        ("pairs", pairs, t_pairs - t_hash),
        ("clusters", clusters, t_clusters - t_pairs),
        ("reps", reps, t_reps - t_clusters),
    ]

    kept_count = None
    ev_quarantined = None
    if args.eval_input:
        # same corrupt-payload policy as the train side: one bad eval
        # payload must not kill the decon stage after hashes/pairs/
        # clusters/reps were already paid for
        ev = perceptual_hash_table(
            spark.read.parquet(args.eval_input).repartition(
                max(spark.sparkContext.defaultParallelism, 8)
            ),
            on_error=args.on_error,
        ).persist()
        # quarantined eval rows have NULL hashes, never join, and so
        # silently VACATE decontamination — count them like the train
        # side so an all-corrupt eval set (kept == reps, nothing
        # actually screened) is visible in the summary, not a silent
        # no-op decon
        ev_quarantined = ev.filter(F.col("format") == "error").count()
        ev = ev.filter(F.col("format") != "error")
        kept = image_decon_keep(
            reps, ev, hamming_max=args.hamming_max, chunks=args.chunks
        )
        kept.write.mode("overwrite").parquet(os.path.join(out, "kept"))
        kept = spark.read.parquet(os.path.join(out, "kept"))
        stages.append(("kept", kept, time.time() - t_reps))
        kept_count = kept.count()

    record_stages(spark, args.metrics_dir, run_id, stages, fingerprint)

    summary = {
        "run_id": run_id,
        "wall_sec": round(time.time() - t0, 2),
        "images": hashes.count(),
        "pairs": pairs.count(),
        "clusters": clusters.select("cluster_id").distinct().count(),
        "reps": reps.count(),
        "kept_after_decon": kept_count,
        "quarantined": n_quarantined,
        "eval_quarantined": ev_quarantined,
        "fingerprint": fingerprint,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
