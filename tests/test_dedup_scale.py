"""Bounded scale smoke for the dedup tiers (VERDICT r1 next-step #10):
a 20k-document synthetic corpus with planted near-duplicates runs
end-to-end through MinHash-LSH and exact Jaccard without driver
broadcasts of per-document tables (the round-1 OOM shape) and finds
the planted pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus_sdf(spark):
    rng = np.random.default_rng(21)
    vocab = [f"tok{i}" for i in range(5000)]
    texts = [
        " ".join(rng.choice(vocab, 30, replace=True)) for _ in range(20_000)
    ]
    # plant 50 near-duplicates: copy with one word changed
    for i in range(50):
        words = texts[i].split()
        words[5] = "mutated"
        texts[10_000 + i] = " ".join(words)
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(16)


def test_minhash_finds_planted_pairs_at_20k_docs(corpus_sdf):
    pairs = dedup.minhash_dedup_pairs(
        corpus_sdf, id_col="doc_id", text_col="text",
        num_hashes=64, bands=16, threshold=0.5,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, 10_000 + i) for i in range(50)}
    assert len(planted & found) >= 45  # LSH may miss a couple
    assert len(found - planted) < 50  # and hallucinate few


def test_exact_jaccard_finds_planted_pairs_at_20k_docs(corpus_sdf):
    pairs = dedup.jaccard_similar_pairs(
        corpus_sdf, id_col="doc_id", text_col="text", threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, 10_000 + i) for i in range(50)}
    assert planted <= found  # exact tier misses nothing
    for r in pairs:
        if (r["id_a"], r["id_b"]) in planted:
            # 30-word doc, 28 3-gram shingles, 6 shingles touch word 5
            assert 0.6 <= r["jaccard"] < 1.0
