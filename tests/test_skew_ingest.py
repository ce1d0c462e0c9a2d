"""Salted-join equivalence (skew path) and the ST4 streaming ingest
dual sink (lake + feature store via checkpointed foreachBatch).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.skew import (
    salted_join,
    top_frequency_keys,
)


def test_salted_join_matches_plain_join(spark):
    rng = np.random.default_rng(3)
    # heavily skewed: 80% of rows share one key
    keys = np.where(rng.random(5000) < 0.8, 1, rng.integers(2, 50, 5000))
    big = spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": rng.normal(0, 1, 5000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": range(50), "name": [f"n{i}" for i in range(50)]})
    )
    plain = big.join(small, ["k"]).groupBy("k", "name").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
    )
    salted = salted_join(big, small, ["k"], salt=8).groupBy("k", "name").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b

    hot = top_frequency_keys(big, ["k"], min_count=1000).collect()
    assert [r["k"] for r in hot] == [1]


def test_streaming_ingest_dual_sink(spark):
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.adapters import (
        normalize_ohlcv,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.store.feature_store import (
        FeatureStore,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.ingest import (
        read_file_stream,
        start_market_ingest,
    )

    rng = np.random.default_rng(9)
    base_ms = 1_700_000_000_000
    close = 100 + np.cumsum(rng.normal(0, 1, 90))
    rows = [
        [base_ms + i * 60_000, float(c), float(c + 0.3), float(c - 0.3), float(c), 5.0]
        for i, c in enumerate(close)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        market = normalize_ohlcv(
            spark, rows, symbol="BTC/USDT", exchange="binance", timeframe="1m"
        )
        market.write.parquet(src)

        lake = os.path.join(tmp, "lake")
        store_path = os.path.join(tmp, "store")
        ckpt = os.path.join(tmp, "ckpt")
        stream = read_file_stream(spark, src, market.schema)
        q = start_market_ingest(
            stream,
            lake_path=lake,
            checkpoint=ckpt,
            feature_store=FeatureStore(spark, store_path),
        )
        q.awaitTermination(120)

        assert spark.read.parquet(lake).count() == 90
        feats = spark.read.parquet(store_path)
        assert feats.count() == 90
        assert "rsi_14" in feats.columns and "ts_epoch" in feats.columns


def test_zorder_key_interleave_and_locality(spark):
    """Exact interleave on known quantized values, and the locality
    property that justifies the layout: chunks of a z-sorted 2D grid
    have bounded extent in BOTH dimensions, unlike a single-column
    sort whose chunks span the full second dimension."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.lake import zorder_key

    n = 32
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    # bits=5 quantizes 0..31 exactly onto itself -> key is the pure
    # Morton interleave; check a known value: x=3 (011), y=5 (101)
    # interleaved (x bit i at 2i, y bit i at 2i+1) = 100111b = 39
    z = zorder_key(grid, ["x", "y"], bits=5)
    val = z.filter((F.col("x") == 3) & (F.col("y") == 5)).first()["zorder_key"]
    assert val == 39

    rows = z.orderBy("zorder_key").select("x", "y").collect()
    chunk = 64
    max_area = 0
    for i in range(0, len(rows), chunk):
        part = rows[i:i + chunk]
        xs = [r["x"] for r in part]; ys = [r["y"] for r in part]
        max_area = max(max_area, (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
    # z-sorted 64-row chunks are ~8x8 tiles (area 64); a y-sorted
    # layout's chunks span x fully (area >= 32*2 = 64 ONLY at perfect
    # tiling, typically 32*k). Assert tight tiles with slack:
    assert max_area <= 256, max_area

    with __import__("pytest").raises(ValueError):
        zorder_key(grid, ["x"], bits=5)
    with __import__("pytest").raises(ValueError):
        zorder_key(grid, ["x", "y"], bits=32)
