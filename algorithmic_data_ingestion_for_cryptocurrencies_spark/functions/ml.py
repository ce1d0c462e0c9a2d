"""Model-inference UDF surface (SURVEY §2 U3/U4) + multimodal column
plumbing.

The reference runs a transformers sentiment pipeline
(``algo-data-ingestion/app/ingestion_service/ml_utils.py:16-68``) and a
SentenceTransformer embedder
(``app/features/processors/nlp_embeddings.py:8-36``). Those model
libraries are not in this container, so the *models* are deterministic
stubs — but the Spark plumbing (Arrow-batched pandas UDFs, struct and
array outputs, mapInPandas batch shape for binary media) is the real,
tested scale path: swap `_stub_*` for a real model handle and nothing
else changes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

SENTIMENT_SCHEMA = StructType([
    StructField("label", StringType()),
    StructField("score", DoubleType()),
    StructField("score_signed", DoubleType()),
])


def _stub_sentiment(text: str) -> tuple[str, float, float]:
    """Deterministic hash-based stand-in for the transformers pipeline
    (same output contract as ``ml_utils._normalize_result``)."""
    if text is None:
        return ("NEUTRAL", 0.0, 0.0)
    h = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    score = (h % 10_000) / 10_000.0
    label = "POSITIVE" if h % 2 == 0 else "NEGATIVE"
    return (label, score, score if label == "POSITIVE" else -score)


@F.pandas_udf(SENTIMENT_SCHEMA)
def sentiment_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched sentiment inference: struct<label, score,
    score_signed> per text (U3). Batch size = Arrow batch — the model
    call amortizes across the batch exactly like the reference's
    thread-pooled ``predict(texts)``."""
    rows = [_stub_sentiment(t) for t in texts]
    return pd.DataFrame(rows, columns=["label", "score", "score_signed"])


EMBEDDING_DIM = 384


def _stub_embed(text: str, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic pseudo-embedding (hash-seeded unit vector)."""
    if text is None:
        return [0.0] * dim
    out = []
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:8], "big")
    state = seed or 1
    for _ in range(dim):
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 64)
        out.append((state / float(1 << 64)) * 2.0 - 1.0)
    mag = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / mag for x in out]


@F.pandas_udf(ArrayType(FloatType()))
def embedding_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched text embedding: array<float> per text (U4).
    Array column (not emb_0..emb_383 wide columns) is the Spark-native
    shape; wide-column parity = ``select(col('emb')[i] ...)``."""
    return texts.map(_stub_embed)


# ---------------------------------------------------------------------------
# Multimodal columns: opaque binary + typed metadata, processed in
# Arrow batches via mapInPandas. Decode is stubbed (no image/audio libs
# in the container) — the schema, batching, and partition flow are real.
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("content", BinaryType()),       # opaque payload
    StructField("mime", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])

MEDIA_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_hash", StringType()),
    StructField("feature", ArrayType(FloatType())),
])


def _stub_decode_features(payload: bytes, kind: str, dim: int = 16) -> list[float]:
    """STUB for decode + feature-extract (resize / frame-sample / mel
    spectrogram...). Real implementation needs PIL/ffmpeg — not in
    this container. Deterministic so pipelines stay testable."""
    if payload is None:
        raise NotImplementedError("media decode requires image/audio libs")
    return _stub_embed(hashlib.md5(payload).hexdigest(), dim)


def media_features(df: DataFrame) -> DataFrame:
    """Batch feature extraction over binary media columns with
    ``mapInPandas``: streams Arrow batches through Python without
    collecting, preserves partitioning, and never materializes the
    binary column beyond the batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "content_hash": pdf["content"].map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
                "feature": pdf.apply(
                    lambda r: _stub_decode_features(r["content"], r["kind"]), axis=1
                ),
            })

    return df.mapInPandas(extract, schema=MEDIA_FEATURE_SCHEMA)
