"""Measure a4_depth physical tiers at sf0.1 and sf1-equivalent.

Tiers:
- object: single-shuffle collect/sort_array aggregate (r3 winner at sf0.1)
- window: r5 fused single-exchange rank tier (side-major ordering,
  pivot reuses the window's partitioning — no second exchange)
- window2x: the r4 two-exchange rank tier (per-side window partition +
  separate pivot shuffle) with map-side WindowGroupLimit pruning,
  reconstructed here for comparison

Run: python tools/bench_depth_tiers.py
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window, functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import _book
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.orderbook import depth_series
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

spark = get_spark("depth-tiers")
spark.sparkContext.setLogLevel("ERROR")


def window2x(df, n_levels=3, keys=("symbol",), ts_col="ts",
             side_col="side", price_col="price", amount_col="amount",
             tiebreak_cols=("okey", "lnum", "amount")):
    keys = list(keys)
    sort_key = F.when(F.col(side_col) == "bid", -F.col(price_col)).otherwise(F.col(price_col))
    w = Window.partitionBy(*keys, ts_col, side_col).orderBy(
        sort_key, *[F.col(c) for c in tiebreak_cols], F.col(amount_col))
    ranked = df.withColumn("__lvl", F.row_number().over(w)).filter(F.col("__lvl") <= n_levels)
    return ranked.groupBy(*keys, ts_col).agg(*[
        F.max(F.when((F.col(side_col) == side) & (F.col("__lvl") == i), F.col(amount_col)))
        .alias(f"{side}_depth_{i}")
        for side in ("bid", "ask") for i in range(1, n_levels + 1)])


def timed(df):
    best = None
    for _ in range(int(__import__("os").environ.get("DEPTH_REPS", "7"))):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


kw = dict(keys=["symbol"], tiebreak_cols=["okey", "lnum", "amount"])
dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/testdata_scaled/sf1"]
for sf_dir in dirs:
    book = _book(spark, sf_dir)
    # warmup scan
    book.count()
    obj = timed(depth_series(book, 3, **kw))
    win = timed(depth_series(book, 3, strategy="window", **kw))
    w2x = timed(window2x(book))
    print(f"{sf_dir}: object={obj:.2f}s window_fused={win:.2f}s window_2x={w2x:.2f}s", flush=True)
spark.stop()
