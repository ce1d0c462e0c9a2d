"""Port of the reference's own pytest-benchmark workloads
(``algo-data-ingestion/tests/features/processors/test_ta_benchmarks.py:9-50``
and ``test_orderbook_benchmark.py:9-42``) as Spark jobs — the
like-for-like operator timing from BASELINE.md protocol step 3.

Workloads (same synthetic generator shapes as the reference):
- CCI(20) over 100k-row 1s-frequency OHLCV
- fused CCI(20)+ROC(12) (one plan; fusion is free under codegen)
- order-book imbalance over 100k timestamps x 2 sides (200k rows)
- fused imbalance+spread

Prints one JSON line with seconds per workload.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (  # noqa: E402
    with_cci,
    with_roc,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.orderbook import (  # noqa: E402
    batch_orderbook,
    imbalance_series,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = 100_000
    rng = np.random.default_rng(42)
    spark = get_spark("adi-ref-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    close = 100 + np.cumsum(rng.normal(0, 0.5, n))
    ohlcv = pd.DataFrame(
        {
            "symbol": "BTC/USDT",
            "ts": pd.date_range("2024-01-01", periods=n, freq="1s").astype("datetime64[us]"),
            "high": close + rng.uniform(0.1, 0.5, n),
            "low": close - rng.uniform(0.1, 0.5, n),
            "close": close,
        }
    )
    sdf = spark.createDataFrame(ohlcv)
    sdf.write.mode("overwrite").format("noop").save()  # materialize conversion

    times: dict[str, float] = {}

    t0 = time.perf_counter()
    with_cci(sdf, 20, keys=["symbol"], order="ts").write.mode("overwrite").format("noop").save()
    times["cci_20_100k"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    fused = with_roc(
        with_cci(sdf, 20, keys=["symbol"], order="ts"),
        "close", 12, keys=["symbol"], order="ts",
    )
    fused.write.mode("overwrite").format("noop").save()
    times["fused_cci_roc_100k"] = round(time.perf_counter() - t0, 3)

    book = pd.DataFrame(
        {
            "ts": np.repeat(
                pd.date_range("2024-01-01", periods=n, freq="1s").astype("datetime64[us]"), 2
            ),
            "side": np.tile(["bid", "ask"], n),
            "price": np.repeat(close, 2) + np.tile([-0.05, 0.05], n),
            "amount": rng.uniform(0.1, 5.0, 2 * n),
        }
    )
    bdf = spark.createDataFrame(book)
    bdf.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    imbalance_series(bdf).write.mode("overwrite").format("noop").save()
    times["imbalance_100k_ts"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    batch_orderbook(bdf).write.mode("overwrite").format("noop").save()
    times["fused_imbalance_spread_100k_ts"] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"metric": "reference_shapes", "unit": "sec", "queries": times}))


if __name__ == "__main__":
    main()
