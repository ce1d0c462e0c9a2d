"""Plan-shape A/B for u6_backtest (r13 verdict task #2 — the one r11
clause carried unexecuted): the shipped 6-window-pass chain
(with_sma_crossover_signals + backtest_positions) vs the 4-pass fused
shape (sma_backtest_curve_fused), whose closed-form position

    position_t = above_t if prefix_min(above) < prefix_max(above) else 0

replaces the lag(above) / ffill(sig) / lag(position) passes with one
WindowExec of O(1)/row frames. Also times the DuckDB twin (the
registry's own oracle SQL) in the same window so the >2x-at-sf1 cell
is adjudicated against a same-window oracle, not a stale campaign
number.

Interleaved round-robin min-of-N (the r10 ordering lesson), values
asserted identical before timing.

Usage: python tools/bench_backtest_shapes.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark import driver_queries as dq
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.backtest import (
    backtest_positions,
    backtest_summary,
    sma_backtest_curve_fused,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.signals import (
    with_sma_crossover_signals,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

FAST, SLOW, FEE = 10, 50, 5.0


def _damped_market(spark, sf_dir):
    return dq._market(spark, sf_dir).withColumn(
        "close", F.lit(10000.0) + F.col("close").cast("double") / 100
    )


def unfused(spark, sf_dir):
    sig = with_sma_crossover_signals(
        _damped_market(spark, sf_dir), "close", FAST, SLOW,
        keys=dq.KEYS, order=dq.ORDER,
    )
    curve = backtest_positions(
        sig, keys=dq.KEYS, order=dq.ORDER,
        price_col="close", position_col="position", fee_bps=FEE,
    )
    return backtest_summary(curve, keys=dq.KEYS)


def fused(spark, sf_dir):
    curve = sma_backtest_curve_fused(
        _damped_market(spark, sf_dir), keys=dq.KEYS, order=dq.ORDER,
        price_col="close", fast=FAST, slow=SLOW, fee_bps=FEE,
    )
    return backtest_summary(curve, keys=dq.KEYS)


def fused_fixed(spark, sf_dir):
    # r14 task #1: the shipped u6 shape — O(1)/row fixed-point SMA
    # pass (shared primitive-LONG running sum + two lags), hash-exact
    # vs the step-identical BIGINT SQL twin
    curve = sma_backtest_curve_fused(
        _damped_market(spark, sf_dir), keys=dq.KEYS, order=dq.ORDER,
        price_col="close", fast=FAST, slow=SLOW, fee_bps=FEE, sma="fixed",
    )
    return backtest_summary(curve, keys=dq.KEYS)


def main() -> None:
    tiers = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_scaled/sf1"]
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-backtest")
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.mode("overwrite").format("noop").save()
    out: dict = {"metric": "backtest_shape_ab", "unit": "sec",
                 "reps_min_of": reps, "tiers": {}}
    _fn, oracle_sql = dq.REGISTRY["u6_backtest"]
    for sf_dir in tiers:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions_for_dir(sf_dir))
        )
        n_shuffle = shuffle_partitions_for_dir(sf_dir)

        def floor_shape():
            # bare_market_sort, verbatim from bench_floor.py: the
            # minimal data motion of any per-series ordered computation
            return _damped_market(spark, sf_dir).repartition(
                n_shuffle, *dq.KEYS
            ).sortWithinPartitions(*dq.KEYS, *dq.ORDER)

        def sma_pass_only():
            # floor + ONLY the sliding-SMA WindowExec (pass 1): where
            # between the sort floor and the full curve the time goes
            from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.rolling import (
                rolling_mean, series_window,
            )

            m = _damped_market(spark, sf_dir)
            w = series_window(dq.KEYS, dq.ORDER)
            return m.withColumn(
                "__above",
                (rolling_mean("close", w, FAST) > rolling_mean("close", w, SLOW))
                .cast("int"),
            )

        def sma_pass_cumsum_diag():
            # DIAGNOSTIC ONLY: the O(1)/row cumsum-difference SMA
            # (sma_t = (cumsum_t - cumsum_{t-n})/n — one running sum +
            # two lags instead of two O(n)-per-row sliding frames).
            # NOT value-exact: the subtraction of two ~1e10 partial
            # sums re-rounds differently than a direct frame AVG, so
            # it can never ship while the oracle compares hash-exact —
            # it exists to quantify how much of the DuckDB gap is its
            # constant-time sliding-window aggregation.
            from pyspark.sql import Window

            from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.rolling import (
                series_window,
            )

            m = _damped_market(spark, sf_dir)
            w = series_window(dq.KEYS, dq.ORDER)
            w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            rn = F.row_number().over(w)
            cs = F.sum("close").over(w_cum)
            m = m.withColumn("__rn", rn).withColumn("__cs", cs)

            def sma(n):
                return F.when(
                    F.col("__rn") >= n,
                    (F.col("__cs") - F.coalesce(F.lag("__cs", n).over(w), F.lit(0.0)))
                    / n,
                )

            return m.withColumn("__above", (sma(FAST) > sma(SLOW)).cast("int"))

        shapes = {
            "unfused": lambda: unfused(spark, sf_dir),
            "fused": lambda: fused(spark, sf_dir),
            "fused_fixed": lambda: fused_fixed(spark, sf_dir),
            "floor_market_sort": floor_shape,
            "sma_pass_only": sma_pass_only,
            "sma_pass_cumsum_diag": sma_pass_cumsum_diag,
        }
        # value identity BEFORE timing (bit-exact — same float exprs;
        # the fixed tier is bit-identical too away from sub-1e-9
        # fast/slow near-ties, asserted here on the real frame);
        # the floor/pass-only cells are diagnostics, not candidates
        a = sorted(map(tuple, unfused(spark, sf_dir).collect()))
        b = sorted(map(tuple, fused(spark, sf_dir).collect()))
        assert a == b, f"{sf_dir}: shapes disagree"
        c = sorted(map(tuple, fused_fixed(spark, sf_dir).collect()))
        assert a == c, f"{sf_dir}: fixed tier diverges from float tier"

        best = {k: None for k in shapes}
        for rep in range(reps):
            order = list(shapes) if rep % 2 == 0 else list(reversed(shapes))
            for k in order:
                clear_persisted_blocks(spark, blocking=True)
                t0 = time.perf_counter()
                noop(shapes[k]())
                dt = time.perf_counter() - t0
                best[k] = dt if best[k] is None else min(best[k], dt)

        # the oracle, same window, same estimator
        import duckdb

        con = duckdb.connect()
        for t in ("lineitem", "orders", "supplier"):
            p = os.path.join(sf_dir, f"{t}.parquet")
            glob = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")
        duck = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(oracle_sql).fetchall()
            duck = min(duck or 9e9, time.perf_counter() - t0)
        con.close()

        cell = {k: round(v, 3) for k, v in best.items()}
        cell["duckdb"] = round(duck, 3)
        cell["ratio_unfused"] = round(best["unfused"] / duck, 3)
        cell["ratio_fused"] = round(best["fused"] / duck, 3)
        cell["ratio_fused_fixed"] = round(best["fused_fixed"] / duck, 3)
        out["tiers"][sf_dir] = cell
        print(sf_dir, cell, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
