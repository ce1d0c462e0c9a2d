"""Trading-signal transforms (SURVEY §2 U6-adjacent surface).

Parity source: the reference's strategy pipeline
(``algo-data-ingestion/HistoricalDataTest.py:83-103``): SMA-crossover
entries/exits as boolean expressions over rolling means, and the
position series as a forward-filled signal (``signal.ffill().
fillna(0)``). The vectorbt backtest/optimizer on top is out of engine
scope (SURVEY §2.10 U6); the signal math itself is plain column
algebra and belongs here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .rolling import ffill, lag_diff, rolling_mean, series_window


def with_sma_crossover_signals(
    df: DataFrame,
    col: str = "close",
    fast: int = 10,
    slow: int = 50,
    *,
    keys: Sequence[str],
    order: str | Sequence[str],
    entry_out: str = "entry_sig",
    exit_out: str = "exit_sig",
    position_out: str = "position",
) -> DataFrame:
    """Golden-cross entries / death-cross exits + forward-filled
    position: entry where fast SMA crosses above slow SMA, exit on the
    reverse cross; position = last signal carried forward, flat (0)
    before the first signal."""
    w = series_window(keys, order)
    fast_ma = rolling_mean(col, w, fast)
    slow_ma = rolling_mean(col, w, slow)
    df = df.withColumn("__fast_ma", fast_ma).withColumn("__slow_ma", slow_ma)
    above = (F.col("__fast_ma") > F.col("__slow_ma")).cast("int")
    df = df.withColumn("__above", above)
    crossed = lag_diff("__above", w, 1)
    df = df.withColumn(entry_out, (crossed == 1).cast("int"))
    df = df.withColumn(exit_out, (crossed == -1).cast("int"))
    sig = F.when(F.col(entry_out) == 1, F.lit(1)).when(
        F.col(exit_out) == 1, F.lit(0)
    )
    df = df.withColumn("__sig", sig)
    df = df.withColumn(position_out, F.coalesce(ffill("__sig", w), F.lit(0)))
    return df.drop("__fast_ma", "__slow_ma", "__above", "__sig")
