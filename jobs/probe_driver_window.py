"""Driver-budget probe: time the first-N queries() window exactly the way
the correctness driver does — Spark query + collect, DuckDB oracle, and the
order-insensitive value compare — and print one JSON line with per-query
walls.  Run standalone (not under the test suite) for honest numbers on
this co-tenant box.

Usage: python jobs/probe_driver_window.py [--n 50] [--sf-dir /root/testdata/sf0.01]
"""

import argparse
import json
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402
from lieu_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # key-sort tolerates None alongside values (multiset equality is
    # preserved under any deterministic key)
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = build_session(
        app_name="probe_driver_window", cores=args.cores,
        shuffle_partitions=args.cores,
    )
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(qs)[: args.n]
    walls, fails = {}, []
    t_all = time.time()
    for name in window:
        t0 = time.time()
        status = "ok"
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is not None:
                res = duck.execute(sql)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                if sorted(scols) != sorted(dcols):
                    status = "cols_mismatch"
                elif len(srows) != len(drows):
                    status = "rows_mismatch"
                elif _rows_to_set(scols, srows) != _rows_to_set(dcols, drows):
                    status = "hash_mismatch"
            else:
                status = "no_oracle"
        except Exception as e:  # noqa: BLE001
            status = f"err:{type(e).__name__}"
        wall = round(time.time() - t0, 1)
        walls[name] = wall
        if status != "ok":
            fails.append((name, status))
        print(f"  {name}: {wall}s {status}", file=sys.stderr, flush=True)
    total = round(time.time() - t_all, 1)
    print(json.dumps({
        "metric": "driver_window_wall", "value": total, "unit": "sec",
        "n": len(window), "sf_dir": args.sf_dir, "fails": fails,
        "slowest": sorted(walls.items(), key=lambda kv: -kv[1])[:8],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
