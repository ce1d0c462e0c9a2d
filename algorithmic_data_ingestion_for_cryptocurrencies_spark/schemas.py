"""Canonical domain schemas + coercion.

Mirrors the reference's fixed-declared-plus-coerced schema system:
- declared per-domain schemas:
  ``algo-data-ingestion/app/ingestion_service/parquet_schemas.py:8-61``
- coercion semantics (missing columns materialized as typed nulls,
  extras preserved after schema columns, casts are null-on-error):
  ``algo-data-ingestion/app/common/time_norm.py:119-162``
- feature output schema:
  ``algo-data-ingestion/app/features/factory/market_factory.py:17-45``

All timestamps are UTC ``TimestampType`` (session timezone is pinned
to UTC by :mod:`..session`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

D = T.DoubleType()
S = T.StringType()
L = T.LongType()
TS = T.TimestampType()


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# market OHLCV bars — parquet_schemas.py:8-19
MARKET_SCHEMA = _st(
    ("timestamp", TS), ("symbol", S), ("exchange", S), ("timeframe", S),
    ("open", D), ("high", D), ("low", D), ("close", D), ("volume", D),
    ("dt", S),
)

# order-book snapshot levels — ccxt_adapter.py:139-147
ORDERBOOK_SCHEMA = _st(
    ("timestamp", TS), ("price", D), ("amount", D), ("side", S),
    ("symbol", S), ("exchange", S),
)

# on-chain metric points — parquet_schemas.py:22-31
ONCHAIN_SCHEMA = _st(
    ("timestamp", TS), ("source", S), ("symbol", S), ("metric", S),
    ("value", D), ("contract_address", S), ("contract_name", S), ("dt", S),
)

# social posts — parquet_schemas.py:34-49
SOCIAL_SCHEMA = _st(
    ("ts", TS), ("source", S), ("id", S), ("author", S), ("text", S),
    ("title", S), ("selftext", S), ("likes", L), ("retweets", L),
    ("score", L), ("num_comments", L), ("sentiment_score", D),
    ("subreddit", S), ("dt", S),
)

# news articles — parquet_schemas.py:52-61
NEWS_SCHEMA = _st(
    ("published_at", TS), ("id", S), ("title", S), ("url", S),
    ("source", S), ("author", S), ("description", S), ("dt", S),
)

FEATURE_VERSION = "market.v1"

# market feature output — market_factory.py:17-45
MARKET_FEATURE_SCHEMA = _st(
    ("timestamp", TS), ("dt", S), ("symbol", S), ("exchange", S),
    ("timeframe", S), ("feature_version", S),
    ("ret_1", D), ("logret_1", D), ("rvol_5", D), ("rvol_20", D),
    ("ema_12", D), ("ema_26", D), ("macd", D), ("macd_signal_9", D),
    ("rsi_14", D), ("hl_spread", D), ("oi_obv", D),
)

DOMAIN_SCHEMAS: dict[str, T.StructType] = {
    "market": MARKET_SCHEMA,
    "orderbook": ORDERBOOK_SCHEMA,
    "onchain": ONCHAIN_SCHEMA,
    "social": SOCIAL_SCHEMA,
    "news": NEWS_SCHEMA,
    "market_features": MARKET_FEATURE_SCHEMA,
}

# per-domain timestamp column — ingestion_service/utils.py:45-51
DOMAIN_TS_COLUMN: dict[str, str] = {
    "market": "timestamp",
    "orderbook": "timestamp",
    "onchain": "timestamp",
    "social": "ts",
    "news": "published_at",
    "market_features": "timestamp",
}


def coerce_schema(
    df: DataFrame,
    schema: T.StructType,
    *,
    keep_extra: bool = True,
) -> DataFrame:
    """Coerce ``df`` to ``schema``: cast existing columns (invalid
    values become NULL — non-ANSI mode), materialize missing columns
    as typed NULLs, order schema columns first and (optionally) keep
    extras after them.

    Parity: ``time_norm.coerce_schema``
    (``algo-data-ingestion/app/common/time_norm.py:136-162``).
    """
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    if keep_extra:
        declared = {f.name for f in schema.fields}
        cols += [F.col(c) for c in df.columns if c not in declared]
    return df.select(*cols)


def validate_schema(df: DataFrame, schema: T.StructType) -> None:
    """Assert declared columns exist with compatible types before a
    sink write (parity with the writer's validate step,
    ``algo-data-ingestion/app/ingestion_service/utils.py:62-89``)."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    mismatched = [
        (f.name, str(by_name[f.name]), str(f.dataType))
        for f in schema.fields
        if by_name[f.name] != f.dataType
    ]
    if mismatched:
        raise ValueError(f"column type mismatches: {mismatched}")
