"""JSON payload surface (SURVEY §2.8 JSON family; VERDICT r1 missing
item #4).

Parity targets:
- the Redis feature store serializes each feature row as a JSON blob
  (``algo-data-ingestion/app/features/store/redis_store.py:145,166,187``)
  — :func:`with_feature_payload` reproduces the blob from the columnar
  row for API-level parity, NaN/Inf sanitized to null first
  (``routes.py:97-113``);
- legacy raw persist flattens nested exchange payloads with
  ``json_normalize`` (``app/storage.py:9-18``) — :func:`parse_payload`
  + :func:`flatten_struct` are the ``from_json`` / ``info.*``
  star-expansion equivalents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .cleaning import nan_inf_to_null


def with_feature_payload(
    df: DataFrame,
    feature_cols: Sequence[str],
    *,
    out: str = "payload",
    sanitize: bool = True,
) -> DataFrame:
    """Append a JSON blob column of the given feature columns (the
    feature-store read-API payload shape). Floats are NaN/Inf→null
    sanitized like the reference's ``_clean_numbers`` so the JSON is
    strictly spec-compliant."""
    cols = []
    for c in feature_cols:
        col = F.col(c)
        if sanitize and isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType)):
            col = nan_inf_to_null(col)
        cols.append(col.alias(c))
    return df.withColumn(out, F.to_json(F.struct(*cols)))


def parse_payload(col: Column | str, schema: T.StructType | str) -> Column:
    """``from_json`` with an explicit schema (never inferred)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema)


def flatten_struct(df: DataFrame, struct_col: str, *, prefix: str | None = None) -> DataFrame:
    """``json_normalize`` equivalent: expand ``struct_col.*`` into
    top-level columns (optionally ``prefix.field``-named like pandas)."""
    pref = f"{prefix}." if prefix else ""
    fields = df.schema[struct_col].dataType.fieldNames()
    return df.select(
        *[c for c in df.columns if c != struct_col],
        *[F.col(f"{struct_col}.{f}").alias(f"{pref}{f}") for f in fields],
    )
