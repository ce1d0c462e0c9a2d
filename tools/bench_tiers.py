"""Resumable per-query tier bench: times each headline query once on
one engine, writing the JSON report incrementally after EVERY query —
safe to kill and re-invoke (completed queries are skipped on resume),
which is how the long scaled tiers (sf3/sf10 with minute-scale
queries) fit into bounded execution windows.

Usage:
    python tools/bench_tiers.py --sf-dir testdata_scaled/sf3 \\
        --engine spark --out /tmp/sf3_spark.json \\
        [--skip q1,q2] [--runs 1]
    python tools/bench_tiers.py ... --engine duckdb ...

The default skip set covers the queries whose WORK is quadratic under
key-shifted time-shared replication (see ROUND5_NOTES): the exact
near-pair sweeps and the keyless range join.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DEFAULT_SKIP = "sim_near_pairs,sim_near_pairs_arrow,j5_range_join"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--engine", choices=["spark", "duckdb"], required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--skip", default=DEFAULT_SKIP)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--sf", type=float, default=-1.0)
    args = ap.parse_args()

    from bench import HEADLINE
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY

    skip = {s for s in args.skip.split(",") if s}
    done: dict = {}
    if os.path.exists(args.out):
        done = json.load(open(args.out)).get("queries", {})

    def save():
        with open(args.out + ".tmp", "w") as f:
            json.dump({"engine": args.engine, "sf": args.sf,
                       "runs": args.runs, "queries": done}, f)
        os.replace(args.out + ".tmp", args.out)

    if args.engine == "spark":
        from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

        spark = get_spark("adi-bench-tier")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        warm = "/root/testdata/sf0.001"
        for name in HEADLINE:
            if name in skip or name in done:
                continue
            fn, _sql = REGISTRY[name]
            try:
                fn(spark, warm).write.mode("overwrite").format("noop").save()
            except Exception:
                pass

        def run_one(name):
            fn, _sql = REGISTRY[name]
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
    else:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = f"{args.sf_dir}/{t}.parquet"
            g = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{g}'")

        def run_one(name):
            _fn, sql = REGISTRY[name]
            if sql is None:
                raise KeyError("no oracle")
            con.sql(sql).fetchall()

    for name in HEADLINE:
        if name in skip or name in done:
            continue
        if args.engine == "duckdb" and REGISTRY[name][1] is None:
            continue
        best = None
        try:
            for _ in range(args.runs):
                t0 = time.perf_counter()
                run_one(name)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            done[name] = round(best, 3)
        except Exception as e:
            done[name] = f"ERR {str(e)[:120]}"
        save()
        print(f"{name}: {done[name]}", flush=True)


if __name__ == "__main__":
    main()
