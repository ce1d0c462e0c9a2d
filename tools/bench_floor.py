"""Machine-checkable "engine floor" probe (r6 verdict #6): for each
tier directory, measure the fixed-cost ladder

- ``empty_job``   — a zero-row noop write (scheduler dispatch)
- ``scan_sum``    — 1-column parquet scan + global sum (IO + codegen)
- ``bare_hash_agg`` / ``bare_hash_agg_str`` — the bare (symbol, ts)
  ~25k-group 4-column hash aggregate over lineitem with NO query
  logic: Spark's hash-aggregate throughput, the documented floor under
  the micro-agg family (a1/a5/e1/e7/sim_knn)
- ``bare_exchange_sort`` (r10) — scan + repartition on the group keys
  + within-partition sort, NO rank/pivot logic: the minimal data
  motion of ANY exact grouped-rank query, the shape-matched floor for
  the window family (a4_depth). Judging a sort-family query against a
  hash-agg floor understated the engine floor by the whole sort.

and the floor-family queries themselves, so every ">2x DuckDB" ratio
in BENCH_SCALED can be linked to the measured floor instead of a
prose claim: a query whose time is within FLOOR_SLACK of its family's
bare shape (or whose absolute cost is sub-second) is floor-bound, not
plan-bound.

r10 measurement discipline (the r9 e7_funnel flip-flop): all shapes
AND queries are timed in interleaved ROUND-ROBIN reps — one run of
each per rep, order reversed on odd reps — so a floor shape and the
query it classifies share the same host-load window instead of being
measured minutes apart (the recorded A/B-ordering lesson, ROUND9_NOTES
"negative result").

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
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

#: the micro-agg floor family named in the r5/r6 verdicts, plus the
#: window-family cell (a4) judged against the sort floor
FLOOR_QUERIES = [
    "a1_imbalance", "a5_resample", "e1_union_agg", "e7_funnel",
    "sim_knn_join", "a4_depth",
    # r11 verdict #5: the sf1-only >2x quartet gets shape-matched
    # floors too (sim_knn_join was already here)
    "dedup_cross_doc_repetition", "text_bigram_lm", "u6_backtest",
]
#: floor shape each query is judged against
FLOOR_REF = {
    "a1_imbalance": "bare_hash_agg_max",
    "a5_resample": "bare_hash_agg_max",
    "e1_union_agg": "bare_hash_agg_max",
    "e7_funnel": "bare_events_sort",  # r13: shape-matched (single-scan window funnel)
    "sim_knn_join": "bare_hash_agg_max",
    "a4_depth": "bare_exchange_sort",
    # minimal work of ANY shingle/bigram statistic: scan documents,
    # tokenize, explode to token grain, one hash agg
    "dedup_cross_doc_repetition": "bare_doc_explode_agg",
    "text_bigram_lm": "bare_doc_explode_agg",
    # minimal data motion of ANY per-series ordered computation over
    # the derived market frame: build the frame, exchange on keys,
    # sort within partitions — zero window/backtest logic
    "u6_backtest": "bare_market_sort",
}
#: a query within this factor of its bare shape is tagged floor-bound
FLOOR_SLACK = 1.5


def main() -> None:
    reps = int(os.environ.get("FLOOR_REPS", "5"))
    spark = get_spark("adi-bench-floor")
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.mode("overwrite").format("noop").save()
    out: dict = {"metric": "engine_floor", "unit": "sec", "reps_min_of": reps,
                 "floor_slack": FLOOR_SLACK, "floor_ref": FLOOR_REF,
                 "schedule": "round_robin_alternating", "tiers": {}}
    for sf_dir in sys.argv[1:]:
        # align with bench_scaled: each tier runs under the SAME
        # partitions policy as its scaled cells (shared (query, tier)
        # cells measured under different shuffle widths was one more
        # way the two artifacts could disagree)
        n_shuffle = shuffle_partitions_for_dir(sf_dir)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.count()  # warm file listing

        bare = (
            li.groupBy((F.col("l_suppkey") % 10).alias("g"), "l_shipdate")
            .agg(
                F.sum("l_quantity").alias("s1"),
                F.sum("l_extendedprice").alias("s2"),
                F.max("l_extendedprice").alias("m1"),
                F.count("*").alias("n"),
            )
        )
        # same aggregate with a STRING group key — the floor family
        # queries group by (symbol string, ts), and string hash-agg
        # probes cost measurably more than int probes
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
        # minimal grouped-rank data motion: the a4 window tier's scan +
        # group-key exchange + within-partition sort over the same
        # column count the book scan carries, with zero query logic
        sort_cols = li.select(
            (F.col("l_suppkey") % 10).alias("g"), "l_shipdate",
            "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber",
        )
        bare_sort = sort_cols.repartition(
            n_shuffle, F.col("g"), F.col("l_shipdate")
        ).sortWithinPartitions(
            "l_shipdate", "g", "l_extendedprice", "l_orderkey", "l_linenumber"
        )

        # r11 verdict #5 shapes
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        bare_doc = (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("n"), F.count_distinct("doc_id").alias("d"))
        )
        from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import (
            KEYS, ORDER, _market,
        )
        mkt = _market(spark, sf_dir)
        bare_mkt = mkt.repartition(n_shuffle, *KEYS).sortWithinPartitions(
            *KEYS, *ORDER
        )
        # r13: shape-matched floor for the single-scan window funnel —
        # events scan (3 pruned columns) + user-key exchange + sort,
        # the minimal data motion of ANY per-user funnel/window pass
        # over events (e7 was judged against the LINEITEM hash-agg
        # floor before, which is not even the same table)
        from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import _t
        ev = _t(spark, sf_dir, "events").select(
            "user_id", "event_type", F.col("ts").cast("double").alias("t")
        )
        bare_ev = ev.repartition(n_shuffle, "user_id").sortWithinPartitions(
            "user_id"
        )

        items: list[tuple[str, object]] = [
            ("empty_job", lambda: noop(spark.range(0))),
            ("scan_sum", lambda: noop(li.agg(F.sum("l_quantity")))),
            ("bare_hash_agg", lambda: noop(bare)),
            ("bare_hash_agg_str", lambda: noop(bare_str)),
            ("bare_exchange_sort", lambda: noop(bare_sort)),
            ("bare_doc_explode_agg", lambda: noop(bare_doc)),
            ("bare_market_sort", lambda: noop(bare_mkt)),
            ("bare_events_sort", lambda: noop(bare_ev)),
        ]
        N_BARE = len(items)
        for name in FLOOR_QUERIES:
            fn = REGISTRY[name][0]
            items.append((name, lambda fn=fn: noop(fn(spark, sf_dir))))

        # interleaved round-robin, order reversed on odd reps: every
        # (shape, query) pair shares the same load window and no item
        # always follows the same predecessor
        best: dict[str, float] = {}
        for rep in range(reps):
            seq = items if rep % 2 == 0 else list(reversed(items))
            for name, thunk in seq:
                clear_persisted_blocks(spark, blocking=True)
                t0 = time.perf_counter()
                thunk()
                dt = time.perf_counter() - t0
                best[name] = min(best.get(name, 9e9), dt)

        tier: dict = {k: round(best[k], 3) for k, _ in items[:N_BARE]}
        tier["shuffle_partitions"] = n_shuffle
        tier["bare_hash_agg_max"] = max(
            tier["bare_hash_agg"], tier["bare_hash_agg_str"]
        )
        tier["queries"] = {n: round(best[n], 3) for n in FLOOR_QUERIES}
        tier["floor_bound"] = {}
        for name in FLOOR_QUERIES:
            ref = tier[FLOOR_REF[name]] if FLOOR_REF[name] in tier else (
                tier["bare_hash_agg_max"]
            )
            t = tier["queries"][name]
            tier["floor_bound"][name] = bool(
                t <= FLOOR_SLACK * ref or t < 1.0
            )
        out["tiers"][os.path.basename(sf_dir.rstrip("/"))] = tier
        print(json.dumps({os.path.basename(sf_dir.rstrip('/')): tier}),
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
