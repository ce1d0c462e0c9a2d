"""Multimodal plumbing (binary columns through mapInPandas) and the
BPE-ish/rolling-hash text ops — the remaining north-star pieces with
no direct test coverage.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.functions.ml import media_features
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import text as textops


def test_media_features_binary_pipeline(spark):
    payloads = [b"\x89PNG_fake_bytes_1", b"RIFF_fake_audio_22", b"\x00\x01\x02"]
    df = spark.createDataFrame(
        [(i, "image" if i < 2 else "audio", p) for i, p in enumerate(payloads)],
        "media_id long, kind string, content binary",
    )
    rows = {r["media_id"]: r for r in media_features(df).collect()}
    assert len(rows) == 3
    for i, p in enumerate(payloads):
        assert rows[i]["n_bytes"] == len(p)
        assert rows[i]["content_hash"] == hashlib.md5(p).hexdigest()
        feat = rows[i]["feature"]
        assert len(feat) == 16  # typed fixed-dim feature vector
        assert all(isinstance(x, float) for x in feat)
    # determinism: same payload -> same feature
    again = {r["media_id"]: r for r in media_features(df).collect()}
    assert again[0]["feature"] == rows[0]["feature"]


def test_bpe_ish_tokens_and_rolling_hash(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["Hello, world! 42 tokens?", "Hello, world! 42 tokens?"]})
    )
    out = df.select(
        "doc_id",
        textops.token_count("text").alias("words"),
        textops.token_count("text", bpe=True).alias("bpe"),
        textops.rolling_hash_fingerprint("text", window=2).alias("fp"),
    ).collect()
    # punctuation/digit runs become their own tokens in the BPE-ish split
    assert out[0]["words"] == 4
    assert out[0]["bpe"] > out[0]["words"]
    # identical docs -> identical winnowing fingerprint
    assert out[0]["fp"] == out[1]["fp"]

    # local edit keeps SOME window hashes -> fingerprint robustness is
    # min-based; a fully different text changes the fingerprint
    other = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3], "text": ["completely different content here"]})
    ).select(textops.rolling_hash_fingerprint("text", window=2).alias("fp"))
    assert other.first()["fp"] != out[0]["fp"]
