"""Timestamp normalization — the reference's load-bearing edge logic.

Parity targets (all in ``/root/reference/algo-data-ingestion/``):
- epoch unit heuristic (values >= 1e12 are milliseconds, >= 1e11 here
  to be safe for far-future seconds):
  ``app/common/time_norm.py:47-60``, ``app/features/store/redis_store.py:68-81``
- ``dt`` partition derivation (``YYYY-MM-DD``): ``app/common/time_norm.py:100-108``
- timeframe parsing (``'1m'`` -> 60 s): ``app/features/jobs/backfill.py:19-29``
- bar-epoch flooring: ``app/features/jobs/backfill.py:32-33``

Everything is a Column expression (JVM-side, codegen-friendly); no
Python UDFs on the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# values at/above this are epoch *milliseconds* (1e11 s ≈ year 5138)
EPOCH_MS_THRESHOLD = 100_000_000_000


def epoch_to_ts(col: Column | str) -> Column:
    """Numeric epoch (auto s-vs-ms per value) -> UTC timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.abs(c) >= F.lit(EPOCH_MS_THRESHOLD), F.timestamp_millis(c.cast("long"))
    ).otherwise(F.timestamp_seconds(c))


def to_utc_ts(col: Column | str) -> Column:
    """Best-effort string/numeric -> UTC timestamp (NULL on failure),
    mirroring the reference's permissive per-value mapper
    (``app/ingestion_service/routes.py:119-170``)."""
    c = F.col(col) if isinstance(col, str) else col
    as_num = c.cast("double")
    return F.when(as_num.isNotNull(), epoch_to_ts(as_num)).otherwise(
        F.to_timestamp(c.cast("string"))
    )


def dt_from_ts(col: Column | str) -> Column:
    """`dt` partition string YYYY-MM-DD from a timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def add_dt(df: DataFrame, ts_col: str = "timestamp", out: str = "dt") -> DataFrame:
    return df.withColumn(out, dt_from_ts(ts_col))


_TF_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def timeframe_to_seconds(tf: str) -> int:
    """'1m' -> 60, '4h' -> 14400, '1d' -> 86400."""
    m = re.fullmatch(r"(\d+)([smhdw])", tf.strip().lower())
    if not m:
        raise ValueError(f"unparseable timeframe: {tf!r}")
    return int(m.group(1)) * _TF_UNITS[m.group(2)]


def floor_to_bar(ts: Column | str, step_seconds: int) -> Column:
    """Floor a timestamp to its bar boundary (epoch - epoch % step).

    The intermediate cast to ``timestamp`` makes this work for
    TIMESTAMP_NTZ inputs too (parquet written without UTC adjustment —
    Spark refuses a direct NTZ→long cast); with the session timezone
    pinned to UTC the wall-clock is preserved.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    epoch = c.cast("timestamp").cast("long")
    return F.timestamp_seconds(epoch - epoch % F.lit(step_seconds))


def standardize_time_column(
    df: DataFrame,
    candidates: tuple[str, ...] = ("timestamp", "ts", "time", "date", "published_at"),
    dest: str = "timestamp",
) -> DataFrame:
    """Find the first present candidate time column, normalize it to a
    UTC timestamp named ``dest`` (``app/common/time_norm.py:83-97``)."""
    for cand in candidates:
        if cand in df.columns:
            out = df.withColumn(dest, to_utc_ts(cand))
            if cand != dest:
                out = out.drop(cand) if cand not in (dest,) else out
            return out
    raise ValueError(f"no time column among {candidates}")
