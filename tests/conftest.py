from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adi-spark-tests", shuffle_partitions=4, extra_conf={
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.default.parallelism": "4",
    })
    yield s


@pytest.fixture(scope="session")
def ohlcv_pdf() -> pd.DataFrame:
    """Synthetic OHLCV ramp + noise, two series keys — mirrors the
    reference's test generator shapes (linear ramp for closed-form
    checks, random walk for regression vs pandas)."""
    rng = np.random.default_rng(42)
    frames = []
    for sym in ("BTC/USDT", "ETH/USDT"):
        n = 120
        ts = pd.date_range("2024-01-01", periods=n, freq="1min")
        close = 100.0 + np.cumsum(rng.normal(0, 1.0, n))
        close[0] = 100.0
        frames.append(pd.DataFrame({
            "timestamp": ts,
            "symbol": sym,
            "exchange": "binance",
            "timeframe": "1m",
            "open": np.roll(close, 1),
            "high": close + rng.uniform(0.1, 0.6, n),
            "low": close - rng.uniform(0.1, 0.6, n),
            "close": close,
            "volume": 10.0 + rng.uniform(0, 5.0, n),
        }))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def ohlcv_sdf(spark, ohlcv_pdf):
    return spark.createDataFrame(ohlcv_pdf)
