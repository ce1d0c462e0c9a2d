"""r15 A/B: window-stage reordering (MACD last + labels-early) vs the
r14 shapes, interleaved in ONE session with the noop sink (guide §1.4)
so host drift cannot masquerade as a win.

    python tools/bench_sortshare_r15.py [--sf-dir DIR] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import (
    REGISTRY,
    _TM_FEATURES,
    _round6,
    market_series_frame,
    _events,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (
    with_hl_spread,
    with_macd,
    with_obv,
    with_returns,
    with_rsi_sma,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.labels import with_labels
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.joins import spine_join
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.resample import resample
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.rolling import (
    rolling_std,
    series_window,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (
    build_market_features,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

ORDER = ["ts", "okey", "lnum"]


def flagship_old(spark, sf_dir):
    """The r14 flagship chain: MACD in the middle (3 sorts)."""
    m = market_series_frame(spark, sf_dir)
    w = series_window(["suppkey"], ORDER)
    df = with_returns(m, "close", keys=["suppkey"], order=ORDER)
    df = df.withColumn("rvol_5", rolling_std("logret_1", w, 5))
    df = df.withColumn("rvol_20", rolling_std("logret_1", w, 20))
    df = with_macd(df, "close", keys=["suppkey"], order=ORDER,
                   fast=12, slow=26, signal=9,
                   macd_out="macd", signal_out="macd_signal_9",
                   hist_out=None, keep_emas=True)
    df = with_rsi_sma(df, "close", 14, keys=["suppkey"], order=ORDER, out="rsi_14")
    df = with_hl_spread(df)
    df = with_obv(df, keys=["suppkey"], order=ORDER, out="oi_obv")
    feats = ["ret_1", "logret_1", "rvol_5", "rvol_20", "ema_12", "ema_26",
             "macd", "macd_signal_9", "rsi_14", "hl_spread", "oi_obv"]
    df = df.filter(F.coalesce(*[F.col(c) for c in feats]).isNotNull())
    # the registry fn is @q-wrapped with a rounding projection on the
    # float columns; apply the identical projection so the parity check
    # and the timing compare like for like
    return df.select("suppkey", "ts", "okey", "lnum",
                     *[_round6(c).alias(c) for c in feats])


def training_old(spark, sf_dir):
    """The r14 training chain: features (MACD mid) -> join -> labels
    (3 sorts). Reconstructed inline against the OLD
    build_market_features order by chaining stages manually."""
    base = market_series_frame(spark, sf_dir)
    bars = resample(
        base, "1w",
        {"close": F.max("close"), "high": F.max("high"),
         "low": F.min("low"), "volume": F.sum("volume")},
        ts_col="ts", keys=["symbol", "exchange", "timeframe"],
        bucket_out="timestamp", pre_cluster=["symbol"],
    ).withColumn("timeframe", F.lit("1w"))
    keys = ["symbol", "exchange", "timeframe"]
    w = series_window(keys, ["timestamp"])
    df = with_returns(bars, "close", keys=keys, order=["timestamp"])
    df = df.withColumn("rvol_5", rolling_std("logret_1", w, 5))
    df = df.withColumn("rvol_20", rolling_std("logret_1", w, 20))
    df = with_macd(df, "close", keys=keys, order=["timestamp"],
                   fast=12, slow=26, signal=9,
                   macd_out="macd", signal_out="macd_signal_9",
                   hist_out=None, keep_emas=True)
    df = with_rsi_sma(df, "close", 14, keys=keys, order=["timestamp"], out="rsi_14")
    df = with_hl_spread(df)
    df = with_obv(df, keys=keys, order=["timestamp"], out="oi_obv")
    ev = _events(spark, sf_dir).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 28 YEARS")
    )
    social = ev.select(
        "ts", F.col("event_id").alias("id"),
        F.col("value").alias("sentiment_score"),
        (F.col("event_type") == "click").alias("is_news"),
    )
    s = resample(
        social, "1w",
        {"sentiment_mean": F.avg("sentiment_score"),
         "social_n": F.count("id"),
         "news_n": F.count(F.when(F.col("is_news"), F.col("id")))},
        ts_col="ts", bucket_out="timestamp",
    )
    out = spine_join(df, [s], on=["timestamp"],
                     fill_zero_cols=["news_n", "sentiment_mean", "social_n"],
                     broadcast_aggs=True)
    out = with_labels(out, "close", keys=keys, order="timestamp")
    fset = set(_TM_FEATURES + ["close", "sentiment_mean", "ret_next"])
    cols = (["symbol", "timestamp"] + _TM_FEATURES
            + ["close", "sentiment_mean", "social_n", "news_n", "ret_next", "y_dir"])
    return out.select(
        *[_round6(c).alias(c) if c in fset else F.col(c) for c in cols]
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("sortshare-ab", shuffle_partitions=shuffle_partitions_for_dir(args.sf_dir))
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    shapes = {
        "flagship_old3sort": lambda: flagship_old(spark, args.sf_dir),
        "flagship_new2sort": lambda: REGISTRY["flagship_market_features"][0](spark, args.sf_dir),
        "training_old3sort": lambda: training_old(spark, args.sf_dir),
        "training_new2sort": lambda: REGISTRY["training_matrix"][0](spark, args.sf_dir),
    }
    # parity check before timing: old and new shapes must be
    # row/value-identical (sorted collect compare on the training pair
    # is done in tests; here a cheap count + checksum)
    for pair in (("flagship_old3sort", "flagship_new2sort"),
                 ("training_old3sort", "training_new2sort")):
        a, b = (shapes[p]() for p in pair)
        ca = a.select(F.sum(F.xxhash64(*a.columns)).alias("h"), F.count("*").alias("n")).collect()[0]
        cb = b.select(F.sum(F.xxhash64(*b.columns)).alias("h"), F.count("*").alias("n")).collect()[0]
        assert (ca["h"], ca["n"]) == (cb["h"], cb["n"]), (pair, ca, cb)
        print(f"parity {pair[0]} == {pair[1]}: n={ca['n']} checksum ok")

    # warm every shape once
    for name, mk in shapes.items():
        mk().write.mode("overwrite").format("noop").save()

    best: dict[str, float] = {}
    for rep in range(args.reps):
        for name, mk in shapes.items():  # interleaved
            clear_persisted_blocks(spark, blocking=True)
            spark.sparkContext.setJobDescription(f"AB {name} rep{rep}")
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
    for name, v in best.items():
        print(f"{name}: {v:.3f} s (min of {args.reps})")


if __name__ == "__main__":
    main()
