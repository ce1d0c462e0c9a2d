"""Machine-checkable "engine floor" probe (r6 verdict #6): for each
tier directory, measure the fixed-cost ladder

- ``empty_job``   — a zero-row noop write (scheduler dispatch)
- ``scan_sum``    — 1-column parquet scan + global sum (IO + codegen)
- ``bare_hash_agg`` — the bare (symbol, ts) ~25k-group 4-column hash
  aggregate over lineitem with NO query logic: Spark's hash-aggregate
  throughput, the documented floor under the micro-agg family
  (a1/a5/e1/e7/sim_knn)

and the floor-family queries themselves, so every ">2x DuckDB" ratio
in BENCH_SCALED can be linked to the measured floor instead of a
prose claim: a query whose time is within FLOOR_SLACK of
``bare_hash_agg`` (or whose absolute cost is sub-second) is
floor-bound, not plan-bound.

Run (after the round's last code commit):
    python tools/bench_floor.py /root/repo/testdata_scaled/sf1 ... \
        > BENCH_FLOOR_r{N}.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

#: the micro-agg floor family named in the r5/r6 verdicts
FLOOR_QUERIES = [
    "a1_imbalance", "a5_resample", "e1_union_agg", "e7_funnel",
    "sim_knn_join", "a4_depth",
]
#: a query within this factor of bare_hash_agg is tagged floor-bound
FLOOR_SLACK = 1.5


def _timed(thunk, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        thunk()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    reps = int(os.environ.get("FLOOR_REPS", "5"))
    spark = get_spark("adi-bench-floor")
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.mode("overwrite").format("noop").save()
    out: dict = {"metric": "engine_floor", "unit": "sec", "reps_min_of": reps,
                 "floor_slack": FLOOR_SLACK, "tiers": {}}
    for sf_dir in sys.argv[1:]:
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.count()  # warm file listing
        tier: dict = {}
        tier["empty_job"] = _timed(lambda: noop(spark.range(0)), reps)
        tier["scan_sum"] = _timed(
            lambda: noop(li.agg(F.sum("l_quantity"))), reps
        )
        bare = (
            li.groupBy((F.col("l_suppkey") % 10).alias("g"), "l_shipdate")
            .agg(
                F.sum("l_quantity").alias("s1"),
                F.sum("l_extendedprice").alias("s2"),
                F.max("l_extendedprice").alias("m1"),
                F.count("*").alias("n"),
            )
        )
        tier["bare_hash_agg"] = _timed(lambda: noop(bare), reps)
        # same aggregate with a STRING group key — the floor family
        # queries group by (symbol string, ts), and string hash-agg
        # probes cost measurably more than int probes; floor-bound is
        # judged against the shape-matched bare cost
        bare_str = (
            li.groupBy(
                F.concat(F.lit("s"), (F.col("l_suppkey") % 10)).alias("g"),
                "l_shipdate",
            )
            .agg(
                F.sum("l_quantity").alias("s1"),
                F.sum("l_extendedprice").alias("s2"),
                F.max("l_extendedprice").alias("m1"),
                F.count("*").alias("n"),
            )
        )
        tier["bare_hash_agg_str"] = _timed(lambda: noop(bare_str), reps)
        floor_cost = max(tier["bare_hash_agg"], tier["bare_hash_agg_str"])
        tier["queries"] = {}
        tier["floor_bound"] = {}
        for name in FLOOR_QUERIES:
            fn = REGISTRY[name][0]
            t = _timed(lambda: noop(fn(spark, sf_dir)), reps)
            tier["queries"][name] = t
            tier["floor_bound"][name] = bool(
                t <= FLOOR_SLACK * floor_cost or t < 1.0
            )
        out["tiers"][os.path.basename(sf_dir.rstrip("/"))] = tier
        print(json.dumps({os.path.basename(sf_dir.rstrip('/')): tier}),
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
