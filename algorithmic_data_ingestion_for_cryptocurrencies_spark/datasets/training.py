"""Training-matrix builder — the reference's closest thing to an OLAP
query (SURVEY §3.4): market features on the bar spine, resampled
social/news aggregates left-joined on, zero-filled, labeled.

Parity source: ``algo-data-ingestion/scripts/build_training_matrix.py:92-165``.

Spark shape: one lazy plan — feature window stage over the spine,
two small bucketed rollups broadcast-joined on, labels via lead() —
a single shuffle for the series window plus broadcast joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..operators.indicators import build_market_features
from ..operators.joins import spine_join
from ..operators.labels import with_labels
from ..operators.resample import resample


def build_training_matrix(
    market: DataFrame,
    *,
    social: DataFrame | None = None,
    news: DataFrame | None = None,
    news_flag_col: str | None = None,
    timeframe: str = "1m",
    keys: Sequence[str] = ("symbol", "exchange", "timeframe"),
    ts_col: str = "timestamp",
) -> DataFrame:
    """market OHLCV (+ social/news) -> labeled feature matrix.

    ``news_flag_col`` (r14, guide §2.3 — aggregate in one pass): when
    the news feed is a row subset of the social feed (the common case:
    both derive from one event stream), pass ``social`` only, with a
    boolean column marking the news rows, instead of a separate
    ``news`` frame. The news count then rides the SAME per-bucket
    rollup as the social aggregates — one source scan, one aggregate,
    one broadcast join instead of two of each. Identical results:
    ``count(when(flag, id))`` is 0 exactly where the separate
    left-join + zero-fill produced 0, and matches its count elsewhere.
    Mutually exclusive with ``news``."""
    market = market.filter(F.col("timeframe") == timeframe) if "timeframe" in market.columns else market
    # close is carried through the feature stage for labeling — the
    # round-2 shape joined it back on (ts, keys), which shuffled both
    # sides of a self-sized join for a column the input already had.
    # r15 (guide §2.4): the LABEL windows (lead/lag of close over
    # (keys, ts)) are computed HERE, before the feature stage, so they
    # ride the feature stage's own (keys, ts) sort instead of forcing
    # a third full-frame sort after the MACD block stage (the old
    # shape: order-sort -> block-sort -> order-sort again for labels).
    # Values are identical for every input: no row is dropped before
    # any window (drop_unlabeled=False keeps the unlabeled rows until
    # the final filter below, exactly where the old shape dropped
    # them), and the label expressions see the same full row set the
    # post-join frame had — build_market_features' dropna_final never
    # drops a row because oi_obv (a cumsum over zero-defaulted terms)
    # is non-null on every row, an invariant pinned by
    # tests/test_fixes_round15.py.
    labeled = with_labels(
        market, "close", keys=keys, order=ts_col, drop_unlabeled=False
    )
    spine = build_market_features(
        labeled, keys=keys, ts_col=ts_col,
        keep_cols=["close", "ret_next", "y_dir"],
    )

    if news_flag_col is not None and news is not None:
        raise ValueError("pass either news= or news_flag_col=, not both")
    if news_flag_col is not None and social is None:
        # r15 (advisor): previously silently ignored — the caller asked
        # for a news count and got a matrix without a news_n column
        raise ValueError("news_flag_col= requires social= (the flag "
                         "marks news rows WITHIN the social feed)")
    aggs = []
    fill_zero: list[str] = []
    if social is not None:
        social_aggs = {
            "sentiment_mean": F.avg("sentiment_score"),
            "social_n": F.count("id"),
        }
        if news_flag_col is not None:
            social_aggs["news_n"] = F.count(
                F.when(F.col(news_flag_col), F.col("id"))
            )
            fill_zero.append("news_n")
        s = resample(
            social,
            timeframe,
            social_aggs,
            ts_col="ts",
            bucket_out=ts_col,
        )
        aggs.append(s)
        fill_zero += ["sentiment_mean", "social_n"]
    if news is not None:
        n = resample(
            news,
            timeframe,
            {"news_n": F.count("id")},
            ts_col="published_at",
            bucket_out=ts_col,
        )
        aggs.append(n)
        fill_zero += ["news_n"]

    # social/news rollups are per-bucket (one row per bar timestamp,
    # no key fan-out) — orders of magnitude under the spine at any
    # scale, so the forced broadcast is safe and skips a spine shuffle
    out = spine_join(
        spine, aggs, on=[ts_col], fill_zero_cols=fill_zero,
        broadcast_aggs=True,
    )
    # the unlabeled-row drop from the old post-join with_labels, plus
    # the historical column order (labels last)
    out = out.filter(F.col("ret_next").isNotNull())
    return out.select(
        *[c for c in out.columns if c not in ("ret_next", "y_dir")],
        "ret_next", "y_dir",
    )
