"""Source-normalization stage (SURVEY §2.1 S1/S2/S5-S9, §3.1 step 3).

The reference's adapters fetch rows from exchanges/APIs and normalize
them into the canonical domain schemas
(``algo-data-ingestion/app/adapters/ccxt_adapter.py:93-113`` market,
``:115-149`` order book, ``onchain_adapter.py:32-94`` Glassnode,
``reddit_adapter.py`` / ``news_adapter.py`` social/news). The fetch
itself is driver-side I/O (HTTP clients are not an engine concern);
THIS module is the engine-side stage: raw python rows →
``createDataFrame`` → timestamp normalization (ms-epoch heuristic) →
schema coercion (missing cols as typed nulls) → ``dt`` partition
derivation. Each normalizer returns a schema-stable DataFrame — empty
input yields an empty frame with the full schema, mirroring the
reference's schema-stable-empty-on-error behavior
(``onchain_adapter.py:84-94``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.time_norm import dt_from_ts, epoch_to_ts
from ..schemas import (
    MARKET_SCHEMA,
    NEWS_SCHEMA,
    ONCHAIN_SCHEMA,
    ORDERBOOK_SCHEMA,
    SOCIAL_SCHEMA,
    coerce_schema,
)

_RAW_OHLCV = T.StructType(
    [
        T.StructField("epoch_ms", T.LongType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
    ]
)


def normalize_ohlcv(
    spark: SparkSession,
    rows: Sequence[Sequence[float]],
    *,
    symbol: str,
    exchange: str,
    timeframe: str,
) -> DataFrame:
    """CCXT OHLCV rows ``[ms, o, h, l, c, v]`` → MARKET_SCHEMA frame
    (``ccxt_adapter.py:93-113``): ms-epoch → UTC ts, identity columns,
    schema coercion, dt partition."""
    typed = [
        (int(r[0]), float(r[1]), float(r[2]), float(r[3]), float(r[4]), float(r[5]))
        for r in rows
    ]
    raw = spark.createDataFrame(typed, schema=_RAW_OHLCV)
    df = (
        raw.withColumn("timestamp", epoch_to_ts("epoch_ms"))
        .withColumn("symbol", F.lit(symbol))
        .withColumn("exchange", F.lit(exchange))
        .withColumn("timeframe", F.lit(timeframe))
        .withColumn("dt", dt_from_ts("timestamp"))
        .drop("epoch_ms")
    )
    return coerce_schema(df, MARKET_SCHEMA, keep_extra=False)


def normalize_order_book(
    spark: SparkSession,
    bids: Sequence[Sequence[float]],
    asks: Sequence[Sequence[float]],
    *,
    symbol: str,
    exchange: str,
    snapshot_epoch_ms: int,
) -> DataFrame:
    """CCXT order-book snapshot ``{bids: [[price, amount]...], asks:
    ...}`` → long ORDERBOOK_SCHEMA frame (``ccxt_adapter.py:115-149``):
    bids+asks concatenated with a side column, stamped with the
    snapshot time."""
    rows = [(float(p), float(a), "bid") for p, a in bids] + [
        (float(p), float(a), "ask") for p, a in asks
    ]
    raw = spark.createDataFrame(rows, schema="price double, amount double, side string")
    df = (
        raw.withColumn("timestamp", epoch_to_ts(F.lit(snapshot_epoch_ms)))
        .withColumn("symbol", F.lit(symbol))
        .withColumn("exchange", F.lit(exchange))
    )
    return coerce_schema(df, ORDERBOOK_SCHEMA, keep_extra=False)


def normalize_onchain(
    spark: SparkSession,
    points: Sequence[Sequence[float]],
    *,
    source: str,
    symbol: str,
    metric: str,
) -> DataFrame:
    """Glassnode-style ``[epoch, value]`` pairs → ONCHAIN_SCHEMA frame
    (``onchain_adapter.py:32-94``); epoch unit auto-detected per value
    (ms vs s heuristic, ``time_norm.py:47-60``)."""
    typed = [(int(t), float(v)) for t, v in points]
    raw = spark.createDataFrame(typed, schema="epoch long, value double")
    df = (
        raw.withColumn("timestamp", epoch_to_ts("epoch"))
        .withColumn("source", F.lit(source))
        .withColumn("symbol", F.lit(symbol))
        .withColumn("metric", F.lit(metric))
        .withColumn("dt", dt_from_ts("timestamp"))
        .drop("epoch")
    )
    return coerce_schema(df, ONCHAIN_SCHEMA, keep_extra=False)


def normalize_social(spark: SparkSession, rows: Sequence[dict], *, source: str) -> DataFrame:
    """Reddit/Twitter-style post dicts → SOCIAL_SCHEMA frame
    (``reddit_adapter.py:38-163``, ``sentiment_adapter.py:81-155``):
    permissive dict input, ms/s epoch heuristic on ``ts``, missing
    fields materialized as typed nulls."""
    if not rows:
        return spark.createDataFrame([], schema=SOCIAL_SCHEMA)
    raw = spark.createDataFrame(rows)
    if "ts" in raw.columns:
        raw = raw.withColumn("ts", epoch_to_ts(F.col("ts").cast("double")))
    df = raw.withColumn("source", F.lit(source)).withColumn("dt", dt_from_ts("ts"))
    return coerce_schema(df, SOCIAL_SCHEMA, keep_extra=False)


def normalize_news(spark: SparkSession, rows: Sequence[dict], *, source: str | None = None) -> DataFrame:
    """News/RSS article dicts → NEWS_SCHEMA frame
    (``news_adapter.py:40-136``, ``scripts/rss_to_parquet.py:20-45``);
    article id derived from the URL tail when absent."""
    from ..functions.cleaning import id_from_url

    if not rows:
        return spark.createDataFrame([], schema=NEWS_SCHEMA)
    raw = spark.createDataFrame(rows)
    if "published_at" in raw.columns:
        raw = raw.withColumn(
            "published_at", epoch_to_ts(F.col("published_at").cast("double"))
        )
    if source is not None and "source" not in raw.columns:
        raw = raw.withColumn("source", F.lit(source))
    if "id" not in raw.columns and "url" in raw.columns:
        raw = raw.withColumn("id", id_from_url("url"))
    df = raw.withColumn("dt", dt_from_ts("published_at"))
    return coerce_schema(df, NEWS_SCHEMA, keep_extra=False)


def normalize_covalent(
    spark: SparkSession,
    items: Sequence[dict],
    *,
    symbol: str,
    snapshot_epoch_ms: int,
) -> DataFrame:
    """Covalent balance items → ONCHAIN_SCHEMA frame
    (``onchain_adapter.py:96-163``): raw integer balances scaled by
    ``10**contract_decimals``, stamped with the snapshot time."""
    if not items:
        return spark.createDataFrame([], schema=ONCHAIN_SCHEMA)
    typed = [
        (
            str(i.get("contract_ticker_symbol") or ""),
            str(i.get("contract_address") or ""),
            str(i.get("contract_name") or ""),
            float(i.get("balance") or 0.0),
            int(i.get("contract_decimals") or 0),
        )
        for i in items
    ]
    raw = spark.createDataFrame(
        typed,
        schema=(
            "metric string, contract_address string, contract_name string, "
            "balance double, decimals int"
        ),
    )
    df = (
        raw.withColumn("value", F.col("balance") / F.pow(F.lit(10.0), F.col("decimals")))
        .withColumn("timestamp", epoch_to_ts(F.lit(snapshot_epoch_ms)))
        .withColumn("source", F.lit("covalent"))
        .withColumn("symbol", F.lit(symbol))
        .withColumn("dt", dt_from_ts("timestamp"))
        .drop("balance", "decimals")
    )
    return coerce_schema(df, ONCHAIN_SCHEMA, keep_extra=False)
