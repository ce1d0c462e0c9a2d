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


def triple_barrier_labels(
    df: DataFrame,
    price_col: str = "close",
    *,
    keys: Sequence[str],
    order: str,
    horizon: int,
    up_pct: float,
    dn_pct: float,
    label_out: str = "tb_label",
    t_out: str = "tb_t_hit",
) -> DataFrame:
    """Triple-barrier labeling (the financial-ML standard beyond the
    reference's next-bar direction): for each bar, walk up to
    ``horizon`` future bars and label +1 if the upper barrier
    (``price * (1 + up_pct)``) is touched first, -1 if the lower
    (``price * (1 - dn_pct)``) first, 0 if neither inside the horizon
    (the vertical barrier). ``t_out`` = bars until the hit (NULL on
    timeout). Within a single bar only the close is visible, so a bar
    crossing BOTH barriers counts as upper-first — document-level
    convention, asserted in tests.

    Spark shape: the future closes ride a bounded window frame
    (``rowsBetween(1, horizon)`` collect_list — frame-ordered, at most
    ``horizon`` elements, so state per row is O(horizon), never the
    series), and the first-touch scan is a higher-order filter over
    that small array. One exchange on the series keys; no self-join,
    no explosion to row-pairs.
    """
    w = series_window(keys, order).rowsBetween(1, horizon)
    fut = F.collect_list(F.col(price_col).cast("double")).over(w)
    up = F.col(price_col).cast("double") * (1.0 + up_pct)
    dn = F.col(price_col).cast("double") * (1.0 - dn_pct)
    hits = F.filter(
        F.transform(
            fut,
            lambda x, i: F.struct(
                (i + 1).alias("t"),
                F.when(x >= up, F.lit(1))
                .when(x <= dn, F.lit(-1))
                .otherwise(F.lit(0))
                .alias("s"),
            ),
        ),
        lambda p: p["s"] != 0,
    )
    return df.withColumn("__hits", hits).select(
        "*",
        F.coalesce(F.col("__hits")[0]["s"], F.lit(0)).alias(label_out),
        F.col("__hits")[0]["t"].alias(t_out),
    ).drop("__hits")
