#!/usr/bin/env python3
"""Reproducible two-parallelism-level scaling probe for the media path
(the numbers in BENCH.md "media-path scaling probes").

Generates a deterministic image corpus once, then measures the
decode+hash stage (the stage that scales with corpus size in
production) INTERLEAVED at two core counts — strong scaling on the full
input at both levels, plus the repo's honest weak protocol (quarter
input at cores/4 vs full input at cores). Separate subprocess per
measurement: a second SparkSession in one process reuses the warm JVM
and invalidates the A/B (see CLAUDE.md measurement discipline).

    python jobs/probe_media_scaling.py \
        [--images 192000] [--cores 8] [--hi-cores 32] [--rounds 2] \
        [--workdir /tmp/media_scale_probe]

Prints one JSON line: per-round walls, throughputs, strong ratio
(hi vs lo on full input) and weak efficiency (lo@quarter / cores@full).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
from lieu_spark.functions.imagehash import synthetic_photo_payloads
ids = spark.range(0, {n}).select(F.col("id").alias("doc_id")).repartition(64)
synthetic_photo_payloads(ids).write.mode("overwrite").parquet({path!r})
spark.stop()
"""

_PROBE = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "{cores}")
         .config("spark.ui.enabled", "false").getOrCreate())
from lieu_spark.functions.imagehash import perceptual_hash_table
df = spark.read.parquet({path!r}).repartition(4 * {cores})
t0 = time.time()
n = perceptual_hash_table(df).count()
print("PROBE", n, round(time.time() - t0, 2))
spark.stop()
"""


def _run(code: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROBE"):
            return float(line.split()[2])
    raise RuntimeError(f"probe produced no PROBE line:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=192000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--hi-cores", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/media_scale_probe")
    args = ap.parse_args()

    full = os.path.join(args.workdir, "images_full.parquet")
    quarter = os.path.join(args.workdir, "images_quarter.parquet")
    for n, path in ((args.images, full), (args.images // 4, quarter)):
        subprocess.run(
            [sys.executable, "-c", _GEN.format(repo=REPO, n=n, path=path)],
            capture_output=True,
            text=True,
            check=True,
        )

    lo, hi = args.cores, args.hi_cores
    lo_q = max(1, lo // 4)
    walls: dict[str, list[float]] = {"hi_full": [], "lo_full": [], "loq_quarter": []}
    for _ in range(args.rounds):
        # interleave every variant within the round: temporally adjacent
        # measurements see the same co-tenant conditions
        walls["hi_full"].append(_run(_PROBE.format(repo=REPO, cores=hi, path=full)))
        walls["lo_full"].append(_run(_PROBE.format(repo=REPO, cores=lo, path=full)))
        walls["loq_quarter"].append(
            _run(_PROBE.format(repo=REPO, cores=lo_q, path=quarter))
        )

    strong = [l / h for l, h in zip(walls["lo_full"], walls["hi_full"])]
    weak = [q / l for q, l in zip(walls["loq_quarter"], walls["lo_full"])]
    print(
        json.dumps(
            {
                "images": args.images,
                "cores": {"lo": lo, "hi": hi, "lo_quarter": lo_q},
                "walls_s": walls,
                "throughput_imgs_per_s": {
                    "hi_full": [round(args.images / w, 1) for w in walls["hi_full"]],
                    "lo_full": [round(args.images / w, 1) for w in walls["lo_full"]],
                },
                "strong_speedup_rounds": [round(s, 3) for s in strong],
                "weak_efficiency_rounds": [round(w, 3) for w in weak],
            }
        )
    )


if __name__ == "__main__":
    main()
