"""Plan-shape A/B for e7_funnel (r13 verdict task #3): the cell sits
over its floor slack at sf3/sf10 and >2x DuckDB at sf10, and its
recorded floor (bare_hash_agg_max over LINEITEM) is not shape-matched
— so this tool measures, in one window:

- join   (shipped pre-r13): one filtered scan + conditional-min agg
  per step, chained by user-id joins (AQE broadcasts the user-grain
  frames). 3 scans of events, 3 agg exchanges, 2 joins.
- window (the r13 winner, promoted into funnel_steps): ONE scan of
  events, one exchange+sort on
  user_id, then three dependent partition-wide conditional-min
  WindowExec passes (t1 -> t2 gated on t1 -> t3 gated on t2) and a
  final user-grain agg that reuses the window partitioning (no new
  exchange).
- floor_events_agg (shape-matched floor): events scan + ONE user-grain
  conditional-min hash aggregate — the minimal work of ANY funnel
  over the events table.

plus the DuckDB twin, same estimator, same window.

Usage: python tools/bench_funnel_shapes.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark import driver_queries as dq
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.funnel import (
    funnel_steps,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

STEPS = ["view", "click", "purchase"]


def join_shape(events):
    """The pre-r13 funnel_steps shape, kept verbatim for the A/B after
    the window shape won and was promoted into the operator."""
    t = F.col("ts").cast("double")
    cur = (
        events.filter(F.col("event_type") == STEPS[0])
        .groupBy("user_id")
        .agg(F.min(t).alias("t_step_1"))
    )
    for i, step in enumerate(STEPS[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == step)
            .select(F.col("user_id"), t.alias("__t"))
            .join(cur.select("user_id", f"t_step_{i - 1}"), "user_id")
            .filter(F.col("__t") > F.col(f"t_step_{i - 1}"))
            .groupBy("user_id")
            .agg(F.min("__t").alias(f"t_step_{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
    completed = sum(
        F.when(F.col(f"t_step_{i}").isNotNull(), 1).otherwise(0) for i in (1, 2, 3)
    )
    return cur.withColumn("steps_completed", completed.cast("int"))


def window_shape(events):
    """Single-scan funnel: dependent partition-wide conditional mins.
    (Now also what funnel_steps itself plans — kept as an independent
    inline build so the A/B stays self-contained.)"""
    w = Window.partitionBy("user_id")
    t = F.col("ts").cast("double")
    df = events.select("user_id", F.col("event_type").alias("et"), t.alias("__t"))
    df = df.withColumn(
        "t_step_1", F.min(F.when(F.col("et") == STEPS[0], F.col("__t"))).over(w)
    )
    df = df.withColumn(
        "t_step_2",
        F.min(
            F.when(
                (F.col("et") == STEPS[1]) & (F.col("__t") > F.col("t_step_1")),
                F.col("__t"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t_step_3",
        F.min(
            F.when(
                (F.col("et") == STEPS[2]) & (F.col("__t") > F.col("t_step_2")),
                F.col("__t"),
            )
        ).over(w),
    )
    out = (
        df.filter(F.col("t_step_1").isNotNull())
        .groupBy("user_id")
        .agg(
            F.first("t_step_1").alias("t_step_1"),
            F.first("t_step_2").alias("t_step_2"),
            F.first("t_step_3").alias("t_step_3"),
        )
    )
    completed = sum(
        F.when(F.col(f"t_step_{i}").isNotNull(), 1).otherwise(0) for i in (1, 2, 3)
    )
    return out.withColumn("steps_completed", completed.cast("int"))


def main() -> None:
    tiers = sys.argv[1:] or ["testdata_scaled/sf1", "testdata_scaled/sf3",
                             "testdata_scaled/sf10"]
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-funnel")
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.mode("overwrite").format("noop").save()
    out: dict = {"metric": "funnel_shape_ab", "unit": "sec",
                 "reps_min_of": reps, "tiers": {}}
    _fn, oracle_sql = dq.REGISTRY["e7_funnel"]
    for sf_dir in tiers:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions_for_dir(sf_dir))
        )
        events = dq._t(spark, sf_dir, "events")  # NTZ-normalizing loader, same as the registry query

        def floor_shape():
            t = F.col("ts").cast("double")
            return events.groupBy("user_id").agg(
                F.min(F.when(F.col("event_type") == STEPS[0], t)).alias("t1")
            )

        shapes = {
            "join": lambda: join_shape(events),
            "shipped_funnel_steps": lambda: funnel_steps(events, STEPS),
            "window": lambda: window_shape(events),
            "floor_events_agg": floor_shape,
        }
        # value identity BEFORE timing (join vs window candidates)
        a = sorted(map(tuple, join_shape(events).collect()))
        b = sorted(map(tuple, window_shape(events).collect()))
        assert a == b, f"{sf_dir}: shapes disagree ({len(a)} vs {len(b)} rows)"
        c = sorted(map(tuple, funnel_steps(events, STEPS).collect()))
        assert a == c, f"{sf_dir}: shipped operator disagrees"

        best = {k: None for k in shapes}
        for rep in range(reps):
            order = list(shapes) if rep % 2 == 0 else list(reversed(shapes))
            for k in order:
                clear_persisted_blocks(spark, blocking=True)
                t0 = time.perf_counter()
                noop(shapes[k]())
                dt = time.perf_counter() - t0
                best[k] = dt if best[k] is None else min(best[k], dt)

        import duckdb

        con = duckdb.connect()
        p = os.path.join(sf_dir, "events.parquet")
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW events AS SELECT * FROM '{glob}'")
        duck = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(oracle_sql).fetchall()
            duck = min(duck or 9e9, time.perf_counter() - t0)
        con.close()

        cell = {k: round(v, 3) for k, v in best.items()}
        cell["duckdb"] = round(duck, 3)
        cell["ratio_join"] = round(best["join"] / duck, 3)
        cell["ratio_window"] = round(best["window"] / duck, 3)
        cell["join_over_floor"] = round(best["join"] / best["floor_events_agg"], 3)
        cell["window_over_floor"] = round(best["window"] / best["floor_events_agg"], 3)
        out["tiers"][sf_dir] = cell
        print(sf_dir, cell, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
