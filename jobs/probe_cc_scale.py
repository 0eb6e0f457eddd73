#!/usr/bin/env python3
"""Connected-components memory-bound probe (VERDICT r4 #2 evidence).

Plants the pathological single-component shape — one hub with N spokes,
the "boilerplate star" — and runs connected_components under a SMALL
JVM heap in a fresh subprocess per arm:

  * arm "bounded": the shipped agg+join star steps (constant-size min()
    aggregation buffers; skewed hub groups stream through spillable
    sort-merge joins).
  * arm "legacy": the pre-r5 collect_set formulation (monkey-patched in
    locally), which materializes the hub's whole O(N) neighbor array in
    ONE aggregation buffer — expected to OOM/GC-lockup at heaps the
    bounded arm sails through.

    python jobs/probe_cc_scale.py [--edges 5000000] [--mem 1g] \
        [--cores 8] [--skip-legacy]

Prints one JSON line {edges, mem, bounded_sec, legacy_sec|null,
legacy_error|null}. A legacy arm crash (OutOfMemoryError / executor
lost / nonzero exit) is the expected demonstration, reported as
legacy_error rather than a probe failure.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ARM = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "{cores}")
         .config("spark.driver.memory", {mem!r})
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import lieu_spark.operators.cluster as cluster

if {legacy}:
    # the pre-r5 formulation, inlined for the A/B only
    def _large_star(edges):
        sym = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        grouped = sym.groupBy("u").agg(
            F.min("v").alias("minv"), F.collect_set("v").alias("nbrs"))
        out = grouped.select(
            F.least(F.col("minv"), F.col("u")).alias("m"),
            F.explode(F.filter(F.col("nbrs"), lambda v: v > F.col("u"))).alias("w"),
        ).select(F.col("w").alias("u"), F.col("m").alias("v"))
        return out.filter(F.col("u") != F.col("v")).distinct()

    def _small_star(edges):
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        grouped = oriented.groupBy("u").agg(
            F.min("v").alias("m"), F.collect_set("v").alias("nbrs"))
        exploded = grouped.select(
            "u", "m",
            F.explode(F.array_union(F.col("nbrs"), F.array(F.col("u")))).alias("w"))
        return (exploded.filter(F.col("w") != F.col("m"))
                .select(F.col("w").alias("u"), F.col("m").alias("v")).distinct())

    cluster._large_star = _large_star
    cluster._small_star = _small_star

pairs = spark.range(1, {edges} + 1).select(
    F.lit("hub").alias("id_a"),
    F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("id_b"),
).repartition({cores})
t0 = time.time()
comp = cluster.connected_components(pairs)
row = comp.agg(F.countDistinct("cluster_id").alias("k"),
               F.count("*").alias("n")).collect()[0]
assert (row["k"], row["n"]) == (1, {edges} + 1), (row["k"], row["n"])
print("PROBE_OK", round(time.time() - t0, 2))
spark.stop()
"""


def _run_arm(edges: int, mem: str, cores: int, legacy: bool):
    code = _ARM.format(
        repo=REPO, edges=edges, mem=mem, cores=cores, legacy=legacy
    )
    import os as _os
    import signal as _signal

    t0 = time.time()
    # own process group: on timeout the WHOLE group is killed — killing
    # only the python child would orphan the Spark driver JVM it
    # spawned, and a GC-locked JVM (the legacy arm's documented failure
    # mode) never notices stdin EOF, so it would keep pinning
    # --cores/--mem on this shared box and contaminate every
    # measurement that follows
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    try:
        out, err = proc.communicate(timeout=3600)
    except subprocess.TimeoutExpired:
        try:
            _os.killpg(proc.pid, _signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        return None, "timeout (GC lockup) after 3600s", round(time.time() - t0, 1)

    wall = None
    for ln in out.splitlines():
        if ln.startswith("PROBE_OK"):
            wall = float(ln.split()[1])
    if proc.returncode != 0 or wall is None:
        tail = (err or out).strip().splitlines()[-30:]
        msg = next(
            (
                ln
                for ln in tail
                if "OutOfMemoryError" in ln or "SparkOutOfMemory" in ln
            ),
            tail[-1] if tail else f"exit={proc.returncode}",
        )
        return None, msg.strip()[:300], round(time.time() - t0, 1)
    return wall, None, round(time.time() - t0, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--mem", default="1g")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--skip-legacy", action="store_true")
    args = ap.parse_args()

    bounded, berr, _ = _run_arm(args.edges, args.mem, args.cores, legacy=False)
    if berr is not None:
        print(json.dumps({"error": f"bounded arm failed: {berr}"}))
        sys.exit(1)
    legacy = lerr = None
    if not args.skip_legacy:
        legacy, lerr, _ = _run_arm(args.edges, args.mem, args.cores, legacy=True)
    print(
        json.dumps(
            {
                "edges": args.edges,
                "mem": args.mem,
                "cores": args.cores,
                "bounded_sec": bounded,
                "legacy_sec": legacy,
                "legacy_error": lerr,
            }
        )
    )


if __name__ == "__main__":
    main()
