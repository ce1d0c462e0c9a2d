"""Driver-contract query registry: every implemented operator family
from SURVEY.md §2 exposed as a named query over the driver's testdata
tables, each paired with the equivalent DuckDB SQL oracle.

Conventions (load-bearing for the correctness gate):

- Window order is ALWAYS a deterministic total order (``ts, okey,
  lnum`` within a ``suppkey`` partition is unique on the lineitem
  series) — ties would make window results nondeterministic.
- Every float output column is rounded on BOTH sides by the SAME
  double-arithmetic formula ``FLOOR(x * 1e6 + 0.5) / 1e6`` (applied
  uniformly by the ``q`` decorator). Engine-native ROUND differs at
  .5 boundaries (Spark exact-decimal HALF_UP vs DuckDB float
  multiply), which flips last-digit values; an explicit FLOOR chain is
  bit-identical on both engines because every step is IEEE-754
  deterministic.
- Computed/aggregate columns are aliased identically in the Spark
  callable and the SQL (the driver sorts columns by name and hashes
  values).
- Hash-based operators (MinHash/SimHash/LSH — xxhash64 has no DuckDB
  twin) register with ``sql=None`` → rows-only check; their *exact*
  counterparts (n-gram Jaccard, brute-force cosine) carry full
  oracles.

Reference parity citations live in the underlying operator modules.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators.asof import asof_join
from .operators.dedup import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_dedup_pairs,
    simhash_near_pairs,
)
from .operators.ewm import ewm_sql, with_ewm
from .operators.indicators import (
    with_adx,
    with_atr,
    with_bollinger,
    with_cci,
    with_hl_spread,
    with_macd,
    with_mfi,
    with_obv,
    with_returns,
    with_roc,
    with_rsi_sma,
    with_rsi_wilder,
    with_stochastic,
    with_vwap,
)
from .operators.joins import expected_grid, find_gaps, spine_join
from .operators.labels import with_labels
from .operators.orderbook import batch_orderbook, depth_series, imbalance_series, spread_series
from .operators.resample import resample, resample_last
from .operators.rolling import (
    cum_max,
    cum_sum,
    drawdown,
    ffill,
    lag_diff,
    log_return,
    pct_change,
    rolling_max,
    rolling_mean,
    rolling_median,
    rolling_min,
    rolling_std,
    rolling_sum,
    series_window,
    with_global_zscore,
    with_rolling_volatility,
)
from .operators.similarity import ann_topk, cosine_topk, embedding_near_pairs, knn_join
from .operators import text as textops

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def SR(expr: str) -> str:
    """SQL-side deterministic 6-decimal rounding (see module doc)."""
    return f"FLOOR(({expr}) * 1e6 + 0.5) / 1e6"


def _round6(c) -> F.Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def q(name: str, sql: str | None, *, cols: Sequence[str] | None = None,
      fcols: Sequence[str] = ()):
    """Register a query. When ``cols`` is given, both the Spark result
    and the SQL are wrapped with a uniform projection that rounds the
    float columns in ``fcols`` with the shared FLOOR formula."""
    fset = set(fcols)

    def deco(fn: QueryFn) -> QueryFn:
        wrapped_sql = sql
        if sql is not None and cols is not None:
            sel = ", ".join(f"{SR(c)} AS {c}" if c in fset else c for c in cols)
            wrapped_sql = f"SELECT {sel} FROM ({sql})"

        if cols is None:
            REGISTRY[name] = (fn, wrapped_sql)
            return fn

        def wrapped_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            df = fn(spark, sf_dir)
            return df.select(
                *[
                    _round6(c).alias(c) if c in fset else F.col(c)
                    for c in cols
                ]
            )

        REGISTRY[name] = (wrapped_fn, wrapped_sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# Market-shaped projection of lineitem: one price series per supplier.
# --------------------------------------------------------------------------

KEYS = ["suppkey"]
ORDER = ["ts", "okey", "lnum"]
PART = "suppkey"
ORD = "ts, okey, lnum"
IDS = ["suppkey", "ts", "okey", "lnum"]

MARKET_SQL = (
    "SELECT l_suppkey AS suppkey, l_shipdate AS ts, l_orderkey AS okey, "
    "l_linenumber AS lnum, l_extendedprice AS close, "
    "l_extendedprice * (1 + l_discount) AS high, "
    "l_extendedprice * (1 - l_discount) AS low, "
    "l_quantity AS volume FROM lineitem"
)


def _market(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        F.col("l_extendedprice").alias("close"),
        (F.col("l_extendedprice") * (F.lit(1) + F.col("l_discount"))).alias("high"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("low"),
        F.col("l_quantity").alias("volume"),
    )


def _w():
    return series_window(KEYS, ORDER)


def _over(frame: str = "") -> str:
    tail = f" {frame}" if frame else ""
    return f"OVER (PARTITION BY {PART} ORDER BY {ORD}{tail})"


def _fr(n: int) -> str:
    return f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"


_CUM = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


def _roll(fn_sql: str, col: str, n: int, arg: str | None = None) -> str:
    """Masked trailing-window aggregate (pandas warmup parity)."""
    inner = f"{fn_sql}({arg or col})"
    return (
        f"CASE WHEN COUNT({col}) {_over(_fr(n))} >= {n} "
        f"THEN {inner} {_over(_fr(n))} END"
    )


# --- W1-W3, W23: lag/lead family ------------------------------------------

@q(
    "w01_lag_diff_lead",
    f"""SELECT suppkey, ts, okey, lnum,
        close - LAG(close, 1) {_over()} AS diff_1,
        LEAD(close, 1) {_over()} AS lead_1
        FROM ({MARKET_SQL})""",
    cols=IDS + ["diff_1", "lead_1"],
    fcols=["diff_1", "lead_1"],
)
def w01(spark, sf_dir):
    m = _market(spark, sf_dir)
    w = _w()
    return m.select(
        *IDS,
        lag_diff("close", w, 1).alias("diff_1"),
        F.lead("close", 1).over(w).alias("lead_1"),
    )


@q(
    "w02_pct_change",
    f"""SELECT suppkey, ts, okey, lnum,
        (close - LAG(close, 1) {_over()}) / NULLIF(LAG(close, 1) {_over()}, 0) AS ret_1
        FROM ({MARKET_SQL})""",
    cols=IDS + ["ret_1"],
    fcols=["ret_1"],
)
def w02(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, pct_change("close", _w(), 1).alias("ret_1"))


@q(
    "w03_log_return",
    f"""SELECT suppkey, ts, okey, lnum,
        LN(NULLIF(close, 0)) - LAG(LN(NULLIF(close, 0)), 1) {_over()} AS logret_1
        FROM ({MARKET_SQL})""",
    cols=IDS + ["logret_1"],
    fcols=["logret_1"],
)
def w03(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, log_return("close", _w(), 1).alias("logret_1"))


@q(
    "w04_rolling_mean",
    f"SELECT suppkey, ts, okey, lnum, {_roll('AVG', 'close', 5)} AS sma_5 FROM ({MARKET_SQL})",
    cols=IDS + ["sma_5"],
    fcols=["sma_5"],
)
def w04(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, rolling_mean("close", _w(), 5).alias("sma_5"))


@q(
    "w05_rolling_std",
    f"SELECT suppkey, ts, okey, lnum, {_roll('STDDEV_SAMP', 'close', 20)} AS std_20 FROM ({MARKET_SQL})",
    cols=IDS + ["std_20"],
    fcols=["std_20"],
)
def w05(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, rolling_std("close", _w(), 20).alias("std_20"))


@q(
    "w06_rolling_sum",
    f"SELECT suppkey, ts, okey, lnum, {_roll('SUM', 'volume', 7)} AS vol_sum_7 FROM ({MARKET_SQL})",
    cols=IDS + ["vol_sum_7"],
    fcols=["vol_sum_7"],
)
def w06(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, rolling_sum("volume", _w(), 7).alias("vol_sum_7"))


@q(
    "w07_rolling_min_max",
    f"""SELECT suppkey, ts, okey, lnum,
        {_roll('MIN', 'low', 14)} AS low_min_14,
        {_roll('MAX', 'high', 14)} AS high_max_14
        FROM ({MARKET_SQL})""",
    cols=IDS + ["low_min_14", "high_max_14"],
    fcols=["low_min_14", "high_max_14"],
)
def w07(spark, sf_dir):
    m = _market(spark, sf_dir)
    w = _w()
    return m.select(
        *IDS,
        rolling_min("low", w, 14).alias("low_min_14"),
        rolling_max("high", w, 14).alias("high_max_14"),
    )


@q(
    "w08_rolling_median",
    f"""SELECT suppkey, ts, okey, lnum,
        {_roll('QUANTILE_CONT', 'close', 15, 'close, 0.5')} AS med_15
        FROM ({MARKET_SQL})""",
    cols=IDS + ["med_15"],
    fcols=["med_15"],
)
def w08(spark, sf_dir):
    m = _market(spark, sf_dir)
    return m.select(*IDS, rolling_median("close", _w(), 15).alias("med_15"))


# --- W9-W11: EWM family ----------------------------------------------------

_EMA_KEEP = ["suppkey", "ts", "okey", "lnum", "close", "volume", "high", "low"]

_W09_SQL = ewm_sql(
    ewm_sql(
        MARKET_SQL, "close", "ema_12",
        keys=[PART], order=ORDER, keep=_EMA_KEEP, span=12,
    ),
    "close", "ema_26",
    keys=[PART], order=ORDER, keep=_EMA_KEEP + ["ema_12"], span=26,
)


@q(
    "w09_ema",
    _W09_SQL,
    cols=IDS + ["ema_12", "ema_26"],
    fcols=["ema_12", "ema_26"],
)
def w09(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_ewm(m, "close", "ema_12", keys=KEYS, order=ORDER, span=12)
    m = with_ewm(m, "close", "ema_26", keys=KEYS, order=ORDER, span=26)
    return m.select(*IDS, "ema_12", "ema_26")


@q(
    "w10_rsi_sma",
    f"""SELECT suppkey, ts, okey, lnum,
       100.0 - (100.0 / (1.0 + __ru / NULLIF(__rd, 0.0))) AS rsi_14
FROM (
  SELECT suppkey, ts, okey, lnum,
         {_roll('AVG', '__up', 14)} AS __ru,
         {_roll('AVG', '__down', 14)} AS __rd
  FROM (
    SELECT *,
           CASE WHEN __delta > 0 THEN __delta ELSE 0.0 END AS __up,
           CASE WHEN __delta < 0 THEN -__delta ELSE 0.0 END AS __down
    FROM (SELECT *, close - LAG(close, 1) {_over()} AS __delta FROM ({MARKET_SQL}))
  )
)""",
    cols=IDS + ["rsi_14"],
    fcols=["rsi_14"],
)
def w10(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_rsi_sma(m, "close", 14, keys=KEYS, order=ORDER, out="rsi_14")
    return m.select(*IDS, "rsi_14")


_GAINS_SQL = f"""
SELECT *,
       CASE WHEN __delta > 0 THEN __delta WHEN __delta IS NOT NULL THEN 0.0 END AS __gain,
       CASE WHEN __delta < 0 THEN -__delta WHEN __delta IS NOT NULL THEN 0.0 END AS __loss
FROM (SELECT *, close - LAG(close, 1) {_over()} AS __delta FROM ({MARKET_SQL}))"""

_W10B_SQL = (
    """SELECT suppkey, ts, okey, lnum,
       CASE WHEN avg_loss = 0 THEN CASE WHEN avg_gain > 0 THEN 100.0 END
            ELSE 100.0 - (100.0 / (1.0 + avg_gain / avg_loss)) END AS rsi_w_14
FROM ("""
    + ewm_sql(
        ewm_sql(
            _GAINS_SQL, "__gain", "avg_gain",
            keys=[PART], order=ORDER,
            keep=["suppkey", "ts", "okey", "lnum", "__loss"],
            alpha=1.0 / 14,
        ),
        "__loss", "avg_loss",
        keys=[PART], order=ORDER,
        keep=["suppkey", "ts", "okey", "lnum", "avg_gain"],
        alpha=1.0 / 14,
    )
    + ")"
)


@q(
    "w10b_rsi_wilder",
    _W10B_SQL,
    cols=IDS + ["rsi_w_14"],
    fcols=["rsi_w_14"],
)
def w10b(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_rsi_wilder(m, "close", 14, keys=KEYS, order=ORDER, out="rsi_w_14")
    return m.select(*IDS, "rsi_w_14")


_MACD_STAGE = (
    "SELECT *, __ema_fast - __ema_slow AS macd FROM ("
    + ewm_sql(
        ewm_sql(
            MARKET_SQL, "close", "__ema_fast",
            keys=[PART], order=ORDER,
            keep=["suppkey", "ts", "okey", "lnum", "close"], span=12,
        ),
        "close", "__ema_slow",
        keys=[PART], order=ORDER,
        keep=["suppkey", "ts", "okey", "lnum", "close", "__ema_fast"], span=26,
    )
    + ")"
)

_W11_SQL = (
    """SELECT suppkey, ts, okey, lnum, macd, macd_signal_9,
       macd - macd_signal_9 AS histogram
FROM ("""
    + ewm_sql(
        _MACD_STAGE, "macd", "macd_signal_9",
        keys=[PART], order=ORDER,
        keep=["suppkey", "ts", "okey", "lnum", "macd"], span=9,
    )
    + ")"
)


@q(
    "w11_macd",
    _W11_SQL,
    cols=IDS + ["macd", "macd_signal_9", "histogram"],
    fcols=["macd", "macd_signal_9", "histogram"],
)
def w11(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_macd(
        m, "close", keys=KEYS, order=ORDER,
        macd_out="macd", signal_out="macd_signal_9", hist_out="histogram",
    )
    return m.select(*IDS, "macd", "macd_signal_9", "histogram")


# --- W12-W16 ---------------------------------------------------------------

@q(
    "w12_bollinger",
    f"""SELECT suppkey, ts, okey, lnum,
        __mid AS bb_middle,
        __mid + 2.0 * __sd AS bb_upper,
        __mid - 2.0 * __sd AS bb_lower
        FROM (SELECT suppkey, ts, okey, lnum, {_roll('AVG', 'close', 20)} AS __mid,
                     {_roll('STDDEV_SAMP', 'close', 20)} AS __sd
              FROM ({MARKET_SQL}))""",
    cols=IDS + ["bb_middle", "bb_upper", "bb_lower"],
    fcols=["bb_middle", "bb_upper", "bb_lower"],
)
def w12(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_bollinger(m, "close", 20, 2.0, keys=KEYS, order=ORDER, prefix="bb")
    return m.select(*IDS, "bb_middle", "bb_upper", "bb_lower")


@q(
    "w13_vwap",
    f"""SELECT suppkey, ts, okey, lnum,
        ({_roll('SUM', '__pv', 10)}) / ({_roll('SUM', 'volume', 10)}) AS vwap_10
        FROM (SELECT *, close * volume AS __pv FROM ({MARKET_SQL}))""",
    cols=IDS + ["vwap_10"],
    fcols=["vwap_10"],
)
def w13(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_vwap(m, 10, keys=KEYS, order=ORDER, out="vwap_10")
    return m.select(*IDS, "vwap_10")


_TR_SQL = f"""
SELECT *, CASE WHEN __pc IS NULL THEN high - low
               ELSE GREATEST(high - low, ABS(high - __pc), ABS(low - __pc)) END AS __tr
FROM (SELECT *, LAG(close, 1) {_over()} AS __pc FROM ({MARKET_SQL}))"""


@q(
    "w14_atr",
    f"SELECT suppkey, ts, okey, lnum, {_roll('AVG', '__tr', 14)} AS atr_14 FROM ({_TR_SQL})",
    cols=IDS + ["atr_14"],
    fcols=["atr_14"],
)
def w14(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_atr(m, 14, keys=KEYS, order=ORDER, out="atr_14")
    return m.select(*IDS, "atr_14")


@q(
    "w15_obv",
    f"""SELECT suppkey, ts, okey, lnum, SUM(__sv) {_over(_CUM)} AS obv
        FROM (SELECT *,
              CASE WHEN __delta IS NULL THEN 0.0 ELSE SIGN(__delta) END
                * COALESCE(volume, 0.0) AS __sv
              FROM (SELECT *, close - LAG(close, 1) {_over()} AS __delta
                    FROM ({MARKET_SQL})))""",
    cols=IDS + ["obv"],
    fcols=["obv"],
)
def w15(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_obv(m, keys=KEYS, order=ORDER, out="obv")
    return m.select(*IDS, "obv")


@q(
    "w16_cum_drawdown",
    f"""SELECT suppkey, ts, okey, lnum,
        SUM(volume) {_over(_CUM)} AS cum_vol,
        MAX(close) {_over(_CUM)} AS run_max,
        (close - MAX(close) {_over(_CUM)}) / NULLIF(MAX(close) {_over(_CUM)}, 0) AS drawdown
        FROM ({MARKET_SQL})""",
    cols=IDS + ["cum_vol", "run_max", "drawdown"],
    fcols=["cum_vol", "run_max", "drawdown"],
)
def w16(spark, sf_dir):
    m = _market(spark, sf_dir)
    w = _w()
    return m.select(
        *IDS,
        cum_sum("volume", w).alias("cum_vol"),
        cum_max("close", w).alias("run_max"),
        drawdown("close", w).alias("drawdown"),
    )


# --- W17, W19-W23 ----------------------------------------------------------

_CCI_STAGE = f"""
SELECT *,
       AVG(__tp) {_over(_fr(20))} AS __tp_ma,
       COUNT(__tp) {_over(_fr(20))} AS __tp_cnt,
       LIST(__tp) {_over(_fr(20))} AS __tp_list
FROM (SELECT *, (high + low + close) / 3.0 AS __tp FROM ({MARKET_SQL}))"""


@q(
    "w17_cci",
    f"""SELECT suppkey, ts, okey, lnum,
       CASE WHEN __tp_cnt >= 20 THEN
               CASE WHEN __md != 0 THEN (__tp - __tp_ma) / (0.015 * __md)
                    ELSE 0.0 END END AS cci_20
FROM (SELECT *, LIST_SUM(LIST_TRANSFORM(__tp_list, x -> ABS(x - __tp_ma))) / 20.0 AS __md
      FROM ({_CCI_STAGE}))""",
    cols=IDS + ["cci_20"],
    fcols=["cci_20"],
)
def w17(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_cci(m, 20, keys=KEYS, order=ORDER, out="cci_20")
    return m.select(*IDS, "cci_20")


@q(
    "w19_stochastic",
    f"""SELECT suppkey, ts, okey, lnum,
        __k AS percent_k,
        CASE WHEN COUNT(__k) {_over(_fr(3))} >= 3 THEN AVG(__k) {_over(_fr(3))} END AS percent_d
        FROM (SELECT *,
              100.0 * (close - ({_roll('MIN', 'low', 14)}))
                / NULLIF(({_roll('MAX', 'high', 14)}) - ({_roll('MIN', 'low', 14)}), 0.0) AS __k
              FROM ({MARKET_SQL}))""",
    cols=IDS + ["percent_k", "percent_d"],
    fcols=["percent_k", "percent_d"],
)
def w19(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_stochastic(
        m, 14, 3, keys=KEYS, order=ORDER, k_out="percent_k", d_out="percent_d"
    )
    return m.select(*IDS, "percent_k", "percent_d")


_ADX_STAGE1 = f"""
SELECT *,
       CASE WHEN __up > __down AND __up > 0 THEN __up ELSE 0.0 END AS __pdm,
       CASE WHEN __down > __up AND __down > 0 THEN __down ELSE 0.0 END AS __mdm,
       CASE WHEN __pc IS NULL THEN high - low
            ELSE GREATEST(high - low, ABS(high - __pc), ABS(low - __pc)) END AS __tr
FROM (SELECT *,
             high - LAG(high, 1) {_over()} AS __up,
             -(low - LAG(low, 1) {_over()}) AS __down,
             LAG(close, 1) {_over()} AS __pc
      FROM ({MARKET_SQL}))"""

_ADX_STAGE2 = f"""
SELECT *,
       100.0 * ({_roll('AVG', '__pdm', 14)}) / __atr AS __pdi,
       100.0 * ({_roll('AVG', '__mdm', 14)}) / __atr AS __mdi
FROM (SELECT *, {_roll('AVG', '__tr', 14)} AS __atr FROM ({_ADX_STAGE1}))"""


@q(
    "w20_adx",
    f"""SELECT suppkey, ts, okey, lnum, {_roll('AVG', '__dx', 14)} AS adx_14
FROM (SELECT *, 100.0 * ABS(__pdi - __mdi) / NULLIF(__pdi + __mdi, 0.0) AS __dx
      FROM ({_ADX_STAGE2}))""",
    cols=IDS + ["adx_14"],
    fcols=["adx_14"],
)
def w20(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_adx(m, 14, keys=KEYS, order=ORDER, out="adx_14")
    return m.select(*IDS, "adx_14")


_MFI_STAGE = f"""
SELECT *,
       CASE WHEN __tp > __ptp THEN __tp * volume ELSE 0.0 END AS __pos,
       CASE WHEN __tp < __ptp THEN __tp * volume ELSE 0.0 END AS __neg
FROM (SELECT *, LAG(__tp, 1) {_over()} AS __ptp
      FROM (SELECT *, (high + low + close) / 3.0 AS __tp FROM ({MARKET_SQL})))"""


@q(
    "w21_mfi",
    f"""SELECT suppkey, ts, okey, lnum,
       100.0 * __pmf / NULLIF(__pmf + __nmf, 0.0) AS mfi_14
FROM (SELECT suppkey, ts, okey, lnum, {_roll('SUM', '__pos', 14)} AS __pmf,
             {_roll('SUM', '__neg', 14)} AS __nmf
      FROM ({_MFI_STAGE}))""",
    cols=IDS + ["mfi_14"],
    fcols=["mfi_14"],
)
def w21(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_mfi(m, 14, keys=KEYS, order=ORDER, out="mfi_14")
    return m.select(*IDS, "mfi_14")


_ANN = repr(float(252) ** 0.5)


@q(
    "w22_volatility",
    f"""SELECT suppkey, ts, okey, lnum,
        ({_roll('STDDEV_SAMP', '__ret', 10)}) * CAST({_ANN} AS DOUBLE) AS volatility
        FROM (SELECT *, (close - LAG(close, 1) {_over()}) / NULLIF(LAG(close, 1) {_over()}, 0) AS __ret
              FROM ({MARKET_SQL}))""",
    cols=IDS + ["volatility"],
    fcols=["volatility"],
)
def w22(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_rolling_volatility(
        m, "close", 10, 252, keys=KEYS, order=ORDER, out="volatility"
    )
    return m.select(*IDS, "volatility")


@q(
    "w23_roc",
    f"""SELECT suppkey, ts, okey, lnum,
        100.0 * (close - LAG(close, 12) {_over()}) / NULLIF(LAG(close, 12) {_over()}, 0.0) AS roc_12
        FROM ({MARKET_SQL})""",
    cols=IDS + ["roc_12"],
    fcols=["roc_12"],
)
def w23(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_roc(m, "close", 12, keys=KEYS, order=ORDER, out="roc_12")
    return m.select(*IDS, "roc_12")


@q(
    "w26_ffill",
    f"""SELECT suppkey, ts, okey, lnum,
        LAST_VALUE(__sparse IGNORE NULLS) {_over(_CUM)} AS close_ffill
        FROM (SELECT *, CASE WHEN lnum < 4 THEN close END AS __sparse
              FROM ({MARKET_SQL}))""",
    cols=IDS + ["close_ffill"],
    fcols=["close_ffill"],
)
def w26(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = m.withColumn("__sparse", F.when(F.col("lnum") < 4, F.col("close")))
    return m.select(*IDS, ffill("__sparse", _w()).alias("close_ffill"))


@q(
    "u5_labels",
    f"""SELECT suppkey, ts, okey, lnum, ret_next, y_dir
        FROM (SELECT suppkey, ts, okey, lnum,
                     LEAD(__ret, 1) {_over()} AS ret_next,
                     CAST(LEAD(__ret, 1) {_over()} > 0 AS INT) AS y_dir
              FROM (SELECT *, (close - LAG(close, 1) {_over()}) / NULLIF(LAG(close, 1) {_over()}, 0) AS __ret
                    FROM ({MARKET_SQL})))
        WHERE ret_next IS NOT NULL""",
    cols=IDS + ["ret_next", "y_dir"],
    fcols=["ret_next"],
)
def u5(spark, sf_dir):
    m = _market(spark, sf_dir)
    m = with_labels(m, "close", keys=KEYS, order=ORDER)
    return m.select(*IDS, "ret_next", "y_dir")


# --- flagship composite (entry() runs this at sf0.001) ---------------------

_BMF_KEEP = ["suppkey", "ts", "okey", "lnum", "close", "high", "low", "volume"]

_BMF_EWM = ewm_sql(
    ewm_sql(
        MARKET_SQL, "close", "ema_12",
        keys=[PART], order=ORDER, keep=_BMF_KEEP, span=12,
    ),
    "close", "ema_26",
    keys=[PART], order=ORDER, keep=_BMF_KEEP + ["ema_12"], span=26,
)

_BMF_MACD = "SELECT *, ema_12 - ema_26 AS macd FROM (" + _BMF_EWM + ")"

_BMF_SIG = ewm_sql(
    _BMF_MACD, "macd", "macd_signal_9",
    keys=[PART], order=ORDER,
    keep=_BMF_KEEP + ["ema_12", "ema_26", "macd"], span=9,
)

_BMF_SQL = f"""
SELECT suppkey, ts, okey, lnum, ret_1, logret_1,
       {_roll('STDDEV_SAMP', 'logret_1', 5)} AS rvol_5,
       {_roll('STDDEV_SAMP', 'logret_1', 20)} AS rvol_20,
       ema_12, ema_26, macd, macd_signal_9, rsi_14, hl_spread, oi_obv
FROM (
  SELECT *,
         100.0 - (100.0 / (1.0 + ({_roll('AVG', '__rup', 14)}) / NULLIF({_roll('AVG', '__rdown', 14)}, 0.0))) AS rsi_14
  FROM (
    SELECT *,
           CASE WHEN __delta > 0 THEN __delta ELSE 0.0 END AS __rup,
           CASE WHEN __delta < 0 THEN -__delta ELSE 0.0 END AS __rdown,
           (close - LAG(close, 1) {_over()}) / NULLIF(LAG(close, 1) {_over()}, 0) AS ret_1,
           LN(NULLIF(close, 0)) - LAG(LN(NULLIF(close, 0)), 1) {_over()} AS logret_1,
           (high - low) / NULLIF(close, 0) AS hl_spread,
           SUM(CASE WHEN __delta IS NULL THEN 0.0 ELSE SIGN(__delta) END * COALESCE(volume, 0.0)) {_over(_CUM)} AS oi_obv
    FROM (SELECT *, close - LAG(close, 1) {_over()} AS __delta FROM ({_BMF_SIG}))
  )
)
QUALIFY COALESCE(ret_1, logret_1,
                 {_roll('STDDEV_SAMP', 'logret_1', 5)},
                 {_roll('STDDEV_SAMP', 'logret_1', 20)},
                 ema_12, ema_26, macd, macd_signal_9, rsi_14, hl_spread, oi_obv) IS NOT NULL
"""

_BMF_FEATURES = [
    "ret_1", "logret_1", "rvol_5", "rvol_20", "ema_12", "ema_26",
    "macd", "macd_signal_9", "rsi_14", "hl_spread", "oi_obv",
]


def market_series_frame(spark, sf_dir):
    """Market-shaped projection with series-identity columns — the
    input both to ``entry()``'s flagship ``build_market_features`` run
    and to the flagship oracle query."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("l_suppkey").cast("string").alias("symbol"),
        F.lit("lake").alias("exchange"),
        F.lit("1d").alias("timeframe"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        F.col("l_extendedprice").alias("close"),
        (F.col("l_extendedprice") * (F.lit(1) + F.col("l_discount"))).alias("high"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("low"),
        F.col("l_quantity").alias("volume"),
    )


@q(
    "flagship_market_features",
    _BMF_SQL,
    cols=IDS + _BMF_FEATURES,
    fcols=_BMF_FEATURES,
)
def flagship(spark, sf_dir):
    m = market_series_frame(spark, sf_dir)
    # same stage list as build_market_features, kept at id granularity
    # (suppkey/ts/okey/lnum) so every row is comparable to the oracle
    w = series_window(["suppkey"], ORDER)
    df = with_returns(m, "close", keys=["suppkey"], order=ORDER)
    df = df.withColumn("rvol_5", rolling_std("logret_1", w, 5))
    df = df.withColumn("rvol_20", rolling_std("logret_1", w, 20))
    df = with_macd(df, "close", keys=["suppkey"], order=ORDER,
                   fast=12, slow=26, signal=9,
                   macd_out="macd", signal_out="macd_signal_9",
                   hist_out=None, keep_emas=True)
    df = with_rsi_sma(df, "close", 14, keys=["suppkey"], order=ORDER, out="rsi_14")
    df = with_hl_spread(df)
    df = with_obv(df, keys=["suppkey"], order=ORDER, out="oi_obv")
    df = df.filter(F.coalesce(*[F.col(c) for c in _BMF_FEATURES]).isNotNull())
    return df.select(*IDS, *_BMF_FEATURES)
