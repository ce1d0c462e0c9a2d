"""Technical-indicator operators (SURVEY §2.5 W9-W22) as DataFrame
transforms.

Parity source: ``/root/reference/algo-data-ingestion/app/features/
processors/ta_indicators.py`` and ``app/features/factory/
market_factory.py``. Each transform appends columns; all math is
built-in column expressions over per-series windows (one shuffle per
distinct (partition, order) spec — Spark computes every frame variant
of the same spec in a single WindowExec), except EMA which uses the
closed-form from :mod:`.ewm`.

Signature convention: ``fn(df, *, keys, order, cols...) -> DataFrame``
where ``keys`` are the series identity columns (e.g. symbol, exchange,
timeframe) and ``order`` the time column(s).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.time_norm import dt_from_ts
from ..schemas import FEATURE_VERSION, MARKET_FEATURE_SCHEMA, coerce_schema
from .ewm import with_ewm, with_ewm_multi
from .rolling import (
    cum,
    cum_sum,
    lag_diff,
    log_return,
    pct_change,
    rolling_agg,
    rolling_mean,
    rolling_std,
    rolling_sum,
    rolling_min,
    rolling_max,
    series_window,
    trailing,
)


def _series(keys: Sequence[str], order) :
    return series_window(keys, order)


def with_sma(df: DataFrame, col: str, n: int, *, keys, order, out: str | None = None) -> DataFrame:
    """SMA — ``ta_indicators.py:121-125``."""
    w = _series(keys, order)
    return df.withColumn(out or f"sma_{n}", rolling_mean(col, w, n))


def with_ema(df: DataFrame, col: str, span: int, *, keys, order, out: str | None = None) -> DataFrame:
    """EMA (ewm span, adjust=False) — ``ta_indicators.py:127-131``."""
    return with_ewm(df, col, out or f"ema_{span}", keys=keys, order=order, span=span)


def with_returns(df: DataFrame, col: str, *, keys, order,
                 ret_out: str = "ret_1", logret_out: str = "logret_1") -> DataFrame:
    """1-period pct + log returns — ``market_factory.py:106-107``."""
    w = _series(keys, order)
    return (
        df.withColumn(ret_out, pct_change(col, w, 1))
          .withColumn(logret_out, log_return(col, w, 1))
    )


def with_rsi_sma(df: DataFrame, col: str, n: int = 14, *, keys, order,
                 out: str | None = None) -> DataFrame:
    """RSI, SMA variant — ``market_factory.py:54-62``.

    up/down are 0.0 (not NULL) on the first row because ``np.where`` on
    a NaN delta picks the else-branch; rs divides by NULLIF(down,0)
    exactly like the reference's ``replace(0, nan)``.
    """
    w = _series(keys, order)
    delta = lag_diff(col, w, 1)
    # stage ±moves: window exprs can't nest inside the rolling mean
    df = df.withColumn("__up", F.when(delta > 0, delta).otherwise(F.lit(0.0)))
    df = df.withColumn("__down", F.when(delta < 0, -delta).otherwise(F.lit(0.0)))
    roll_up = rolling_mean("__up", w, n)
    roll_down = rolling_mean("__down", w, n)
    rs = roll_up / F.nullif(roll_down, F.lit(0.0))
    return df.withColumn(
        out or f"rsi_{n}", F.lit(100.0) - (F.lit(100.0) / (F.lit(1.0) + rs))
    ).drop("__up", "__down")


def with_rsi_wilder(df: DataFrame, col: str, n: int = 14, *, keys, order,
                    out: str | None = None) -> DataFrame:
    """RSI, Wilder/EWM variant — ``ta_indicators.py:59-77``
    (``ewm(alpha=1/n, adjust=False)`` of clipped gains/losses; the
    clip keeps the first delta NULL, matching pandas NaN-skip)."""
    w = _series(keys, order)
    delta = lag_diff(col, w, 1)
    df = df.withColumn("__gain", F.when(delta > 0, delta).otherwise(
        F.when(delta.isNotNull(), F.lit(0.0))))
    df = df.withColumn("__loss", F.when(delta < 0, -delta).otherwise(
        F.when(delta.isNotNull(), F.lit(0.0))))
    df = with_ewm_multi(
        df,
        [
            {"col": "__gain", "out": "__avg_gain", "alpha": 1.0 / n},
            {"col": "__loss", "out": "__avg_loss", "alpha": 1.0 / n},
        ],
        keys=keys,
        order=order,
    )
    rs = F.col("__avg_gain") / F.col("__avg_loss")
    # pandas parity for avg_loss==0: gain/0 = inf -> RSI 100 (all-gain
    # history); 0/0 = NaN -> NULL. Non-ANSI Spark x/0 is NULL, so the
    # inf branch must be explicit.
    rsi = F.when(
        F.col("__avg_loss") == 0,
        F.when(F.col("__avg_gain") > 0, F.lit(100.0)),
    ).otherwise(F.lit(100.0) - (F.lit(100.0) / (F.lit(1.0) + rs)))
    return df.withColumn(out or f"rsi_{n}", rsi).drop(
        "__gain", "__loss", "__avg_gain", "__avg_loss"
    )


def with_macd(df: DataFrame, col: str, *, keys, order,
              fast: int = 12, slow: int = 26, signal: int = 9,
              macd_out: str = "macd", signal_out: str | None = None,
              hist_out: str | None = "histogram",
              keep_emas: bool = False) -> DataFrame:
    """MACD line / signal / histogram — ``ta_indicators.py:79-89``.

    All THREE EWMs share one block structure: fast/slow run fused, and
    the signal pass (which must follow the MACD projection) reuses the
    staged position columns via ``pos_col`` — valid because the MACD
    line's null pattern equals the close's (ema null iff close's
    position index < 0) — so every EWM window shares the same
    partition spec and Catalyst keeps the whole family in one sort
    chain.
    """
    from .ewm import block_size_for

    k = max(
        block_size_for(span=fast),
        block_size_for(span=slow),
        block_size_for(span=signal),
    )
    df = with_ewm_multi(
        df,
        [
            {"col": col, "out": "__ema_fast", "span": fast},
            {"col": col, "out": "__ema_slow", "span": slow},
        ],
        keys=keys,
        order=order,
        k=k,
        keep_stage=True,
    )
    df = df.withColumn(macd_out, F.col("__ema_fast") - F.col("__ema_slow"))
    df = with_ewm_multi(
        df,
        [
            {
                "col": macd_out,
                "out": signal_out or f"macd_signal_{signal}",
                "span": signal,
                "pos_col": col,
            }
        ],
        keys=keys,
        order=order,
        k=k,
    )
    if hist_out:
        df = df.withColumn(
            hist_out, F.col(macd_out) - F.col(signal_out or f"macd_signal_{signal}")
        )
    if keep_emas:
        df = df.withColumnRenamed("__ema_fast", f"ema_{fast}").withColumnRenamed(
            "__ema_slow", f"ema_{slow}")
    else:
        df = df.drop("__ema_fast", "__ema_slow")
    return df


def with_bollinger(df: DataFrame, col: str, n: int = 20, num_std: float = 2.0, *,
                   keys, order, prefix: str = "bb") -> DataFrame:
    """Bollinger middle/upper/lower — ``ta_indicators.py:91-100``."""
    w = _series(keys, order)
    mid = rolling_mean(col, w, n)
    sd = rolling_std(col, w, n)
    return (
        df.withColumn(f"{prefix}_middle", mid)
          .withColumn(f"{prefix}_upper", mid + F.lit(num_std) * sd)
          .withColumn(f"{prefix}_lower", mid - F.lit(num_std) * sd)
    )


def with_vwap(df: DataFrame, n: int, *, keys, order,
              price_col: str = "close", volume_col: str = "volume",
              out: str | None = None) -> DataFrame:
    """Rolling VWAP — ``ta_indicators.py:102-117``."""
    w = _series(keys, order)
    pv = F.col(price_col) * F.col(volume_col)
    return df.withColumn(
        out or f"vwap_{n}",
        rolling_sum(pv, w, n) / rolling_sum(F.col(volume_col), w, n),
    )


def true_range(w, high: str = "high", low: str = "low", close: str = "close") -> Column:
    """TR = max(h-l, |h-prev_c|, |l-prev_c|); greatest() skips NULLs so
    the first row degrades to h-l exactly like pandas' skipna max —
    ``ta_indicators.py:133-145``."""
    prev_close = F.lag(F.col(close), 1).over(w)
    return F.greatest(
        F.col(high) - F.col(low),
        F.abs(F.col(high) - prev_close),
        F.abs(F.col(low) - prev_close),
    )


def with_atr(df: DataFrame, n: int = 14, *, keys, order,
             high: str = "high", low: str = "low", close: str = "close",
             out: str | None = None) -> DataFrame:
    """ATR = rolling mean of TR — ``ta_indicators.py:133-145``."""
    w = _series(keys, order)
    df = df.withColumn("__tr", true_range(w, high, low, close))
    df = df.withColumn(out or f"atr_{n}", rolling_mean("__tr", w, n))
    return df.drop("__tr")


def with_obv(df: DataFrame, *, keys, order,
             price_col: str = "close", volume_col: str = "volume",
             out: str = "obv") -> DataFrame:
    """OBV = cumsum(sign(Δclose)·volume), first sign 0 —
    ``ta_indicators.py:147-154``, ``market_factory.py:64-67``."""
    w = _series(keys, order)
    delta = lag_diff(price_col, w, 1)
    direction = F.when(delta.isNull(), F.lit(0.0)).otherwise(F.signum(delta))
    df = df.withColumn("__signed_vol", direction * F.coalesce(F.col(volume_col), F.lit(0.0)))
    return df.withColumn(out, cum_sum("__signed_vol", w)).drop("__signed_vol")


def with_cci(df: DataFrame, n: int = 20, constant: float = 0.015, *, keys, order,
             high: str = "high", low: str = "low", close: str = "close",
             out: str | None = None) -> DataFrame:
    """CCI — ``ta_indicators.py:5-26,156-164``.

    Needs the rolling *mean absolute deviation around the current
    row's MA*, which no single window aggregate expresses. The frame
    is a fixed n rows, so the deviation sum is unrolled into n
    ``lag`` terms — every expression stays in whole-stage codegen and
    all window functions (avg, count, n-1 lags) share one WindowExec
    pass. (Round-2 used collect_list + an interpreted higher-order
    fold: ~n closure invocations per row, measured ~2x slower.)

    The warmup mask makes the unroll complete, not approximate:
    ``count >= n`` over an n-row trailing frame implies the frame has
    exactly n rows with zero nulls, so the n lag terms are exactly the
    frame's values.
    """
    w = _series(keys, order)
    frame = trailing(w, n)
    tp = (F.col(high) + F.col(low) + F.col(close)) / F.lit(3.0)
    df = df.withColumn("__tp", tp)
    df = df.withColumn("__tp_ma", F.avg("__tp").over(frame))
    df = df.withColumn("__tp_cnt", F.count("__tp").over(frame))
    # terms ordered oldest-first so the float summation order matches
    # the frame-ordered sequential fold of the round-2 implementation
    # and the DuckDB oracle's LIST_SUM (IEEE addition isn't associative)
    dev_terms = [
        F.abs((F.col("__tp") if i == 0 else F.lag("__tp", i).over(w)) - F.col("__tp_ma"))
        for i in range(n - 1, -1, -1)
    ]
    md = sum(dev_terms[1:], dev_terms[0]) / F.lit(float(n))
    cci = F.when(
        F.col("__tp_cnt") >= n,
        F.when(md != 0, (F.col("__tp") - F.col("__tp_ma")) / (F.lit(constant) * md))
         .otherwise(F.lit(0.0)),
    )
    return df.withColumn(out or f"cci_{n}", cci).drop(
        "__tp", "__tp_ma", "__tp_cnt")


def with_stochastic(df: DataFrame, k_window: int = 14, d_window: int = 3, *,
                    keys, order, high: str = "high", low: str = "low",
                    close: str = "close",
                    k_out: str = "percent_k", d_out: str = "percent_d") -> DataFrame:
    """Stochastic %K/%D — ``ta_indicators.py:166-174``."""
    w = _series(keys, order)
    low_min = rolling_min(low, w, k_window)
    high_max = rolling_max(high, w, k_window)
    df = df.withColumn(
        k_out,
        F.lit(100.0) * (F.col(close) - low_min) / F.nullif(high_max - low_min, F.lit(0.0)),
    )
    return df.withColumn(d_out, rolling_mean(k_out, w, d_window))


def with_adx(df: DataFrame, n: int = 14, *, keys, order,
             high: str = "high", low: str = "low", close: str = "close",
             out: str | None = None) -> DataFrame:
    """ADX — ``ta_indicators.py:176-193`` (three stacked rolling means;
    ±DM are 0.0 on the first row per np.where-on-NaN semantics).

    The middle window stage computes three same-frame means over
    columns that are non-null by construction (±DM default to 0.0, TR
    degrades to high-low), so all three share ONE count(__tr) warmup
    mask instead of three separate count window expressions."""
    w = _series(keys, order)
    up = lag_diff(high, w, 1)
    down = -lag_diff(low, w, 1)
    df = df.withColumn("__plus_dm", F.when((up > down) & (up > 0), up).otherwise(F.lit(0.0)))
    df = df.withColumn("__minus_dm", F.when((down > up) & (down > 0), down).otherwise(F.lit(0.0)))
    df = df.withColumn("__tr", true_range(w, high, low, close))
    df = df.withColumn("__cnt", F.count("__tr").over(trailing(w, n)))
    shared = F.col("__cnt")
    df = df.withColumn("__atr", rolling_agg(F.avg, "__tr", w, n, count_col=shared))
    df = df.withColumn(
        "__plus_di",
        F.lit(100.0) * rolling_agg(F.avg, "__plus_dm", w, n, count_col=shared) / F.col("__atr"),
    )
    df = df.withColumn(
        "__minus_di",
        F.lit(100.0) * rolling_agg(F.avg, "__minus_dm", w, n, count_col=shared) / F.col("__atr"),
    )
    dx = F.lit(100.0) * F.abs(F.col("__plus_di") - F.col("__minus_di")) / F.nullif(
        F.col("__plus_di") + F.col("__minus_di"), F.lit(0.0))
    df = df.withColumn("__dx", dx)
    df = df.withColumn(out or f"adx_{n}", rolling_mean("__dx", w, n))
    return df.drop("__tr", "__cnt", "__atr", "__plus_di", "__minus_di", "__dx")


def with_mfi(df: DataFrame, n: int = 14, *, keys, order,
             high: str = "high", low: str = "low", close: str = "close",
             volume: str = "volume", out: str | None = None) -> DataFrame:
    """Money Flow Index — ``ta_indicators.py:195-206``."""
    w = _series(keys, order)
    tp = (F.col(high) + F.col(low) + F.col(close)) / F.lit(3.0)
    df = df.withColumn("__tp", tp)
    prev_tp = F.lag(F.col("__tp"), 1).over(w)
    mf = F.col("__tp") * F.col(volume)
    df = df.withColumn("__pos", F.when(F.col("__tp") > prev_tp, mf).otherwise(F.lit(0.0)))
    df = df.withColumn("__neg", F.when(F.col("__tp") < prev_tp, mf).otherwise(F.lit(0.0)))
    pos_mf = rolling_sum("__pos", w, n)
    neg_mf = rolling_sum("__neg", w, n)
    mfi = F.lit(100.0) * pos_mf / F.nullif(pos_mf + neg_mf, F.lit(0.0))
    return df.withColumn(out or f"mfi_{n}", mfi).drop("__tp", "__pos", "__neg")


def with_roc(df: DataFrame, col: str, n: int = 12, *, keys, order,
             out: str | None = None) -> DataFrame:
    """Rate of change = 100·diff(n)/shift(n) — ``ta_indicators.py:208-212``."""
    w = _series(keys, order)
    prev = F.lag(F.col(col), n).over(w)
    return df.withColumn(
        out or f"roc_{n}", F.lit(100.0) * (F.col(col) - prev) / F.nullif(prev, F.lit(0.0))
    )


def with_hl_spread(df: DataFrame, *, high: str = "high", low: str = "low",
                   close: str = "close", out: str = "hl_spread") -> DataFrame:
    """(high - low) / close with 0-close -> NULL — ``market_factory.py:119``."""
    return df.withColumn(
        out, (F.col(high) - F.col(low)) / F.nullif(F.col(close), F.lit(0))
    )


DEFAULT_SERIES_KEYS = ("symbol", "exchange", "timeframe")


def build_market_features(
    df: DataFrame,
    *,
    keys: Sequence[str] = DEFAULT_SERIES_KEYS,
    ts_col: str = "timestamp",
    order_cols: Sequence[str] | None = None,
    dropna_final: bool = True,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Flagship feature stage — parity with
    ``market_factory.build_market_features`` (``market_factory.py:73-156``):
    ret_1, logret_1, rvol_5/20, ema_12/26, macd, macd_signal_9, rsi_14,
    hl_spread, oi_obv, plus dt + feature_version, rows with all-NULL
    features dropped.

    One logical plan: Catalyst fuses all rolling expressions sharing
    the (keys, ts) window into a single sort+window stage.
    ``order_cols`` (default ``[ts_col]``) lets callers add tiebreak
    columns for deterministic window order when timestamps can tie.
    ``keep_cols`` are input columns carried through after the feature
    schema (e.g. ``close`` for downstream labeling — carrying it is
    free, while joining it back on costs a shuffle of both sides).
    """
    order = list(order_cols) if order_cols is not None else [ts_col]
    w = series_window(keys, order)
    # r15 (guide §2.4 "windows keyed the same way share one sort"):
    # every stage here rides the (keys, order) window spec EXCEPT the
    # MACD family, whose block-renormalized EWMs sort by (keys,
    # __block, order). Running MACD in the middle sandwiched the block
    # sort between two (keys, order) window groups, costing a THIRD
    # full-frame sort to restore the order for rsi/obv (r14 plan:
    # Sort(4)/Sort(26) on identical keys around the block Sort(13)).
    # MACD runs LAST so the plain-order group sorts once: 3 sorts -> 2.
    # Pure stage reordering — each column's expression graph (windows,
    # frames, operands) is unchanged, so values are bit-identical.
    df = with_returns(df, "close", keys=keys, order=order)
    df = df.withColumn("rvol_5", rolling_std("logret_1", w, 5))
    df = df.withColumn("rvol_20", rolling_std("logret_1", w, 20))
    df = with_rsi_sma(df, "close", 14, keys=keys, order=order, out="rsi_14")
    df = with_hl_spread(df)
    df = with_obv(df, keys=keys, order=order, out="oi_obv")
    df = with_macd(df, "close", keys=keys, order=order,
                   fast=12, slow=26, signal=9,
                   macd_out="macd", signal_out="macd_signal_9",
                   hist_out=None, keep_emas=True)
    df = df.withColumn("dt", dt_from_ts(ts_col))
    df = df.withColumn("feature_version", F.lit(FEATURE_VERSION))
    out = coerce_schema(df, MARKET_FEATURE_SCHEMA, keep_extra=True).select(
        *[f.name for f in MARKET_FEATURE_SCHEMA.fields], *keep_cols
    )
    if dropna_final:
        feature_cols = [
            "ret_1", "logret_1", "rvol_5", "rvol_20", "ema_12", "ema_26",
            "macd", "macd_signal_9", "rsi_14", "hl_spread", "oi_obv",
        ]
        out = out.filter(F.coalesce(*[F.col(c) for c in feature_cols]).isNotNull())
    return out


def build_market_features_arrow(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("suppkey",),
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    id_cols: Sequence[str] = (),
) -> DataFrame:
    """Alternate PHYSICAL strategy for the flagship feature stage: one
    ``applyInPandas`` per series computes every feature in a single
    O(n) pandas pass (C-speed rolling/ewm) — one shuffle total vs the
    expression plan's window-stage chain. Same logical features as
    :func:`build_market_features` (values agree to float tolerance;
    the expression plan remains the oracle-exact path). Series are
    bounded per key, so no group outgrows a task — the same contract
    as ``with_ewm_exact``.
    """
    import numpy as np
    from pyspark.sql import types as T

    keys = list(keys)
    order = list(order_cols) if order_cols is not None else [ts_col]
    feature_fields = [
        T.StructField(c, T.DoubleType())
        for c in (
            "ret_1", "logret_1", "rvol_5", "rvol_20", "ema_12", "ema_26",
            "macd", "macd_signal_9", "rsi_14", "hl_spread", "oi_obv",
        )
    ]
    out_fields = [df.schema[c] for c in (*keys, *id_cols, ts_col)] + feature_fields
    schema = T.StructType(out_fields)

    def compute(pdf):
        pdf = pdf.sort_values(order).reset_index(drop=True)
        close = pdf["close"].astype(float)
        prev = close.shift(1)
        out = pdf[[*keys, *id_cols, ts_col]].copy()
        out["ret_1"] = (close - prev) / prev.replace(0.0, np.nan)
        logc = np.log(close.replace(0.0, np.nan))
        out["logret_1"] = logc - logc.shift(1)
        out["rvol_5"] = out["logret_1"].rolling(5).std()
        out["rvol_20"] = out["logret_1"].rolling(20).std()
        out["ema_12"] = close.ewm(span=12, adjust=False).mean()
        out["ema_26"] = close.ewm(span=26, adjust=False).mean()
        out["macd"] = out["ema_12"] - out["ema_26"]
        out["macd_signal_9"] = out["macd"].ewm(span=9, adjust=False).mean()
        delta = close.diff()
        up = delta.clip(lower=0).fillna(0.0)
        down = (-delta).clip(lower=0).fillna(0.0)
        rs = up.rolling(14).mean() / down.rolling(14).mean().replace(0.0, np.nan)
        out["rsi_14"] = 100.0 - 100.0 / (1.0 + rs)
        out["hl_spread"] = (pdf["high"] - pdf["low"]) / close.replace(0.0, np.nan)
        out["oi_obv"] = (np.sign(delta.fillna(0.0)) * pdf["volume"].fillna(0.0)).cumsum()
        feature_cols = [f.name for f in feature_fields]
        return out[out[feature_cols].notna().any(axis=1)]

    return df.groupBy(*keys).applyInPandas(compute, schema=schema)
