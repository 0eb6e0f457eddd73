#!/usr/bin/env python3
"""spark-submit entrypoint for the composed training-data curation
funnel (lieu_spark/curate.py): annotate -> quality/repetition filter ->
PII scrub -> decontaminate -> near-dup dedupe -> cluster reps ->
leakage-safe split -> sequence packing.

Packaging (north-rule shape, same as jobs/run_dedupe.py):

    cd /root/repo && zip -r /tmp/lieu_spark.zip lieu_spark
    spark-submit \
      --master <cluster-or-local[N]> \
      --py-files /tmp/lieu_spark.zip \
      jobs/run_curate.py \
      --input  /path/to/documents(.parquet: doc_id, text) \
      --output /path/to/output_dir \
      [--holdout /path/to/eval_docs.parquet] \
      [--checkpoint-dir DIR] [--metrics-dir DIR] \
      [--pack-capacity 2048] [--pack-nshards 64] \
      [--min-quality6 250000] [--min-tokens 5] [--split-salt curate]

Outputs under --output: kept/ (the curated corpus), clusters/, splits/,
packed/ (per-doc sequence assignment), annotated/ (audit columns only —
no raw text, so unscrubbed PII never lands in the output or the store).
Resume: rerun the same command — completed stages with a matching
config+input fingerprint load from --checkpoint-dir (the dedupe
sub-pipeline checkpoints under <checkpoint-dir>/dedupe).
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
    ap.add_argument("--holdout", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--metrics-dir", default=None)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-quality6", type=int, default=250000)
    ap.add_argument("--min-lm-score6", type=int, default=None,
                    help="set to add the bigram-LM quality gate")
    ap.add_argument("--line-dedup", action="store_true",
                    help="add the C4-style corpus-wide line-dedup stage")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet (doc_id, text) target corpus for DSIR selection")
    ap.add_argument("--dsir-top-k", type=int, default=None,
                    help="keep the k most target-like survivors (needs --dsir-target)")
    ap.add_argument("--decon-verbatim-ngram", type=int, default=None,
                    help="set (e.g. 13) to also remove docs sharing an "
                         "exact n-token window with a holdout doc")
    ap.add_argument("--group-cap", type=int, default=None,
                    help="set to cap kept docs per --group-cap-col value")
    ap.add_argument("--group-cap-col", default="lang")
    ap.add_argument("--mixture-rates", default=None,
                    help="data-mixing rates for the kept corpus as "
                         "'group=rate,group=rate' (e.g. 'en=0.9,de=1.0')")
    ap.add_argument("--mixture-group-col", default="lang")
    ap.add_argument("--mixture-default-rate", type=float, default=1.0)
    ap.add_argument("--chunk-max-tokens", type=int, default=None,
                    help="set to chunk kept docs into sliding windows "
                         "of at most this many tokens before packing")
    ap.add_argument("--chunk-overlap", type=int, default=0)
    ap.add_argument("--pack-capacity", type=int, default=2048)
    ap.add_argument("--pack-nshards", type=int, default=64)
    ap.add_argument("--split-salt", default="curate")
    ap.add_argument("--shuffle-salt", default=None,
                    help="set to add the training-order shuffle stage")
    ap.add_argument("--shuffle-nshards", type=int, default=64)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from lieu_spark.checkpoint import StageStore
    from lieu_spark.curate import CurateConfig, curate
    from lieu_spark.session import attach_session

    spark = attach_session("lieu_spark_curate")

    cfg = CurateConfig(
        min_tokens=args.min_tokens,
        min_quality6=args.min_quality6,
        min_lm_score6=args.min_lm_score6,
        line_dedup=args.line_dedup,
        dsir_top_k=args.dsir_top_k,
        decon_verbatim_ngram=args.decon_verbatim_ngram,
        group_cap=args.group_cap,
        group_cap_col=args.group_cap_col,
        mixture_rates=(
            {
                k: float(v)
                for k, v in (p.split("=", 1) for p in args.mixture_rates.split(","))
            }
            if args.mixture_rates
            else None
        ),
        mixture_group_col=args.mixture_group_col,
        mixture_default_rate=args.mixture_default_rate,
        chunk_max_tokens=args.chunk_max_tokens,
        chunk_overlap=args.chunk_overlap,
        pack_capacity=args.pack_capacity,
        pack_nshards=args.pack_nshards,
        split_salt=args.split_salt,
        shuffle_salt=args.shuffle_salt,
        shuffle_nshards=args.shuffle_nshards,
    )
    documents = spark.read.parquet(args.input).select("doc_id", "text")
    holdout = (
        spark.read.parquet(args.holdout).select("doc_id", "text")
        if args.holdout
        else None
    )
    dsir_target = (
        spark.read.parquet(args.dsir_target).select("doc_id", "text")
        if args.dsir_target
        else None
    )
    store = StageStore(args.checkpoint_dir) if args.checkpoint_dir else None
    metrics_dir = args.metrics_dir or os.path.join(args.output, "metrics")

    t0 = time.time()
    res = curate(
        spark,
        documents,
        cfg,
        holdout=holdout,
        dsir_target=dsir_target,
        store=store,
        metrics_dir=metrics_dir,
        run_id=args.run_id,
    )
    for name, df in (
        ("kept", res.kept),
        ("clusters", res.clusters),
        ("splits", res.splits),
        ("packed", res.packed),
        ("annotated", res.annotated),
    ):
        df.write.mode("overwrite").parquet(os.path.join(args.output, name))
    summary = {
        "wall_sec": round(time.time() - t0, 2),
        "n_input": documents.count(),
        "n_kept": res.kept.count(),
        "n_sequences": res.packed.select("split", "shard", "seq").distinct().count(),
        "stage_wall": {k: round(v, 2) for k, v in res.stage_wall.items()},
        "config_fingerprint": cfg.fingerprint(),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
