"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship feature pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 (registry lives in
``algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries`` — each Spark callable is defined
side-by-side with its DuckDB oracle; hash-based operators register
without SQL → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import (  # noqa: E402
    REGISTRY,
    market_series_frame,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (  # noqa: E402
    build_market_features,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full market-feature
    stage (ret/logret, rvol, EMA/MACD/RSI, hl_spread, OBV) over the
    per-supplier price series."""
    m = market_series_frame(spark, "/root/testdata/sf0.001").withColumnRenamed(
        "ts", "timestamp"
    )
    return build_market_features(
        m,
        keys=["suppkey"],
        ts_col="timestamp",
        order_cols=["timestamp", "okey", "lnum", "pkey"],
        dropna_final=True,
    )


def _panel(names: list[str]) -> list[str]:
    """Default contract: the FULL registry, deterministically (r11,
    advisor finding — the r10 rotation keyed itself off whatever
    BENCH_r*.json files sat on disk, so a clean clone and this working
    tree exposed different slices; and the driver caps its own panel
    at 50 queries anyway, so rotation bought nothing).  An explicit
    ``SPARK_GRAFT_PANEL=rotate:K`` pins a one-third slice (k = K mod
    3) for callers that genuinely want a subset."""
    mode = os.environ.get("SPARK_GRAFT_PANEL", "full")
    if mode.startswith("rotate:"):
        k = int(mode.split(":", 1)[1]) % 3
        return sorted(names)[k::3]
    return names


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    keep = set(_panel(list(REGISTRY)))
    return {name: fn for name, (fn, _sql) in REGISTRY.items() if name in keep}


def oracle_sql() -> dict[str, str]:
    keep = set(_panel(list(REGISTRY)))
    return {
        name: sql
        for name, (_fn, sql) in REGISTRY.items()
        if sql is not None and name in keep
    }
