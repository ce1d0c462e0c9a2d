"""Training-label transforms (SURVEY §2 U5).

Parity source: ``algo-data-ingestion/scripts/build_market_dataset.py:76-81``
and ``scripts/build_training_matrix.py:85-89``: next-period return and
direction flag, last row (no lookahead) dropped.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .rolling import pct_change, series_window


def with_labels(
    df: DataFrame,
    price_col: str = "close",
    *,
    keys: Sequence[str],
    order: str,
    ret_out: str = "ret_next",
    dir_out: str = "y_dir",
    drop_unlabeled: bool = True,
) -> DataFrame:
    """ret_next = pct_change().shift(-1); y_dir = (ret_next > 0)::int."""
    w = series_window(keys, order)
    df = df.withColumn("__ret", pct_change(price_col, w, 1))
    df = df.withColumn(ret_out, F.lead("__ret", 1).over(w)).drop("__ret")
    df = df.withColumn(dir_out, (F.col(ret_out) > 0).cast("int"))
    if drop_unlabeled:
        df = df.filter(F.col(ret_out).isNotNull())
    return df
