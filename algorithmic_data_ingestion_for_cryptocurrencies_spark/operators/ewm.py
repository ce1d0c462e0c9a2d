"""Exponentially-weighted mean (EWM/EMA) — the one reference operator
with no native Spark window expression (SURVEY §7.3 "hard parts").

Reference semantics: pandas ``ewm(span=n, adjust=False).mean()``
(``algo-data-ingestion/app/features/factory/market_factory.py:51-52``,
``app/features/processors/ta_indicators.py:127-131``) and
``ewm(alpha=1/n, adjust=False)`` for Wilder RSI
(``ta_indicators.py:73-74``).

Two implementations:

1. :func:`with_ewm` — **native closed form** (default). For
   ``adjust=False``::

       y_t = r^t * ( x_0 + a * Σ_{j=1..t} x_j * r^(-j) ),  r = 1 - a

   expressed as a running windowed sum, so it stays inside Tungsten
   codegen with zero Python. Positions are counted over *non-null*
   values, which matches pandas when NaNs only lead the series (the
   only case the reference produces: rolling warmups). Numerical
   range: ``r^(-j)`` grows with the series length; safe for series up
   to ~``700/-log10(r)`` rows (≈8000 rows at span=12, ≈20k at span=26).
   For unbounded series use :func:`with_ewm_exact`.

2. :func:`with_ewm_exact` — ``applyInPandas`` per series key running
   pandas' own recursion; bit-identical to the reference for any
   length, at Arrow-transfer cost. Series keys (symbol × exchange ×
   timeframe) bound each group, so groups parallelize across the
   cluster and no group outgrows a task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .rolling import series_window


def _alpha(span: int | None, alpha: float | None, com: float | None) -> float:
    if sum(x is not None for x in (span, alpha, com)) != 1:
        raise ValueError("give exactly one of span / alpha / com")
    if span is not None:
        return 2.0 / (span + 1.0)
    if com is not None:
        return 1.0 / (1.0 + com)
    return float(alpha)


def with_ewm(
    df: DataFrame,
    col: str,
    out: str,
    *,
    keys: Sequence[str],
    order: str | Sequence[str],
    span: int | None = None,
    alpha: float | None = None,
    com: float | None = None,
) -> DataFrame:
    """Append EWM-mean column ``out`` (adjust=False), JVM-native."""
    a = _alpha(span, alpha, com)
    r = 1.0 - a
    w = series_window(keys, order)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    c = F.col(col)
    # position within the non-null subseries (0-based); null rows carry
    # the previous position so they emit the previous EWM value.
    idx = (F.count(c).over(wcum) - F.lit(1)).alias("__ewm_idx")
    df = df.withColumn("__ewm_idx", idx)
    term = F.when(c.isNull(), F.lit(None)).otherwise(
        F.when(F.col("__ewm_idx") == 0, c).otherwise(
            F.lit(a) * c * F.pow(F.lit(r), -F.col("__ewm_idx"))
        )
    )
    df = df.withColumn("__ewm_s", F.sum(term).over(wcum))
    return df.withColumn(
        out,
        F.when(
            F.col("__ewm_idx") >= 0,
            F.pow(F.lit(r), F.col("__ewm_idx")) * F.col("__ewm_s"),
        ),
    ).drop("__ewm_idx", "__ewm_s")


def with_ewm_exact(
    df: DataFrame,
    col: str,
    out: str,
    *,
    keys: Sequence[str],
    order: str | Sequence[str],
    span: int | None = None,
    alpha: float | None = None,
    com: float | None = None,
) -> DataFrame:
    """Append EWM-mean column ``out`` via pandas recursion per series
    key group (``applyInPandas``) — exact for unbounded series."""
    from pyspark.sql import types as T

    a = _alpha(span, alpha, com)
    order_cols = [order] if isinstance(order, str) else list(order)
    # fresh StructType: StructType.add mutates the receiver in place,
    # which would corrupt the input DataFrame's cached schema
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out, T.DoubleType())])

    def compute(pdf):
        pdf = pdf.sort_values(order_cols)
        pdf[out] = pdf[col].ewm(alpha=a, adjust=False).mean()
        return pdf

    return df.groupBy(*keys).applyInPandas(compute, schema=out_schema)


def ewm_sql(value_expr: str, a: float, partition: str, order: str) -> str:
    """ANSI-SQL rendering of the same closed form (used for DuckDB
    oracle queries; kept here so Spark + oracle share one formula)."""
    r = 1.0 - a
    return f"""
        pow({r}, idx) * sum(
            CASE WHEN idx = 0 THEN {value_expr}
                 ELSE {a} * {value_expr} * pow({r}, -idx) END
        ) OVER (PARTITION BY {partition} ORDER BY {order}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
