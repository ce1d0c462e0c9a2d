"""Time-bucket resample aggregation (SURVEY §2 A5 / ST6).

Parity source: pandas ``resample(tf).mean()/.count()/.last()`` in
``algo-data-ingestion/scripts/build_training_matrix.py:70-82`` and
``HistoricalDataTest.py:54``.

Spark shape: tumbling buckets via epoch-floor (identical to
``F.window`` but emitting a plain bucket-start timestamp column,
which joins cleanly onto bar spines and is duckdb-oracle friendly).
Works unchanged on streams (it is a plain groupBy over a derived
event-time column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.time_norm import floor_to_bar, timeframe_to_seconds


def bucket_col(ts_col: str, timeframe: str) -> Column:
    return floor_to_bar(ts_col, timeframe_to_seconds(timeframe))


def resample(
    df: DataFrame,
    timeframe: str,
    aggs: dict[str, Column],
    *,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    bucket_out: str = "bucket",
) -> DataFrame:
    """Tumbling-window aggregate: one row per (keys..., bucket).

    ``aggs`` maps output column name -> aggregate Column, e.g.
    ``{"sentiment_mean": F.avg("sentiment_score"), "n": F.count("id")}``.
    """
    bucketed = df.withColumn(bucket_out, bucket_col(ts_col, timeframe))
    gb = bucketed.groupBy(*list(keys), bucket_out)
    return gb.agg(*[c.alias(name) for name, c in aggs.items()])


def resample_last(
    df: DataFrame,
    timeframe: str,
    value_cols: Sequence[str],
    *,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    bucket_out: str = "bucket",
) -> DataFrame:
    """pandas ``resample(tf).last()`` — last-by-time value per bucket
    (implemented with max_by to stay a single aggregate, no window)."""
    bucketed = df.withColumn(bucket_out, bucket_col(ts_col, timeframe))
    aggs = [F.max_by(F.col(c), F.col(ts_col)).alias(c) for c in value_cols]
    return bucketed.groupBy(*list(keys), bucket_out).agg(*aggs)
