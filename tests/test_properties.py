"""Property-based parity tests (hypothesis): the pandas semantics of
the core operators must hold across randomized series shapes, not
just the fixtures — lengths spanning the EWM block boundary, arbitrary
alphas, duplicate timestamps in as-of probes, ragged null patterns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.asof import asof_join
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.ewm import with_ewm
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.rolling import (
    rolling_mean,
    rolling_std,
    series_window,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    n=st.integers(min_value=1, max_value=700),
    alpha=st.floats(min_value=0.01, max_value=0.99),
    null_every=st.integers(min_value=0, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_ewm_matches_pandas_any_shape(spark, n, alpha, null_every, seed):
    """Lengths straddle the block size; nulls only LEAD the series
    (the only pattern the reference produces — SURVEY §7.3)."""
    rng = np.random.default_rng(seed)
    x = 100 + np.cumsum(rng.normal(0, 1, n))
    pdf = pd.DataFrame({"k": "a", "i": np.arange(n), "x": x})
    if null_every:
        lead = min(null_every, n - 1)
        pdf.loc[: lead - 1, "x"] = None
    sdf = spark.createDataFrame(pdf)
    got = (
        with_ewm(sdf, "x", "y", keys=["k"], order="i", alpha=alpha)
        .orderBy("i")
        .toPandas()["y"]
        .to_numpy()
    )
    exp = pdf["x"].ewm(alpha=alpha, adjust=False).mean().to_numpy()
    mask = ~np.isnan(exp)
    assert np.isnan(got[~mask]).all()
    np.testing.assert_allclose(got[mask], exp[mask], rtol=1e-9)


@given(
    n=st.integers(min_value=2, max_value=200),
    w=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_rolling_mean_std_match_pandas(spark, n, w, seed):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({"k": "a", "i": np.arange(n), "x": rng.normal(0, 10, n)})
    win = series_window(["k"], "i")
    got = (
        spark.createDataFrame(pdf)
        .select("i", rolling_mean("x", win, w).alias("m"), rolling_std("x", win, w).alias("s"))
        .orderBy("i")
        .toPandas()
    )
    exp_m = pdf["x"].rolling(w).mean().to_numpy()
    exp_s = pdf["x"].rolling(w).std().to_numpy()
    for got_col, exp in (("m", exp_m), ("s", exp_s)):
        g = got[got_col].to_numpy()
        mask = ~np.isnan(exp)
        assert np.isnan(g[~mask]).all()
        np.testing.assert_allclose(g[mask], exp[mask], rtol=1e-9, atol=1e-12)


@given(
    n_left=st.integers(min_value=1, max_value=60),
    n_right=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, n_left, n_right, seed):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": "a",
            "t": np.sort(rng.integers(0, 500, n_left)).astype("int64"),
            "lv": rng.normal(0, 1, n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": "a",
            "t": np.sort(rng.choice(500, n_right, replace=False)).astype("int64"),
            "rv": rng.normal(0, 1, n_right),
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            keys=["k"],
            value_cols=["rv"],
        )
        .orderBy("t", "lv")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.sort_values(["t", "lv"]), right, on="t", by="k", direction="backward"
    ).sort_values(["t", "lv"])
    np.testing.assert_allclose(
        got.sort_values(["t", "lv"])["rv_asof"].to_numpy(),
        exp["rv"].to_numpy(),
        rtol=1e-12,
        equal_nan=True,
    )


@given(
    n_words=st.integers(min_value=0, max_value=120),
    chunk=st.integers(min_value=4, max_value=32),
    ov_frac=st.floats(min_value=0.0, max_value=0.9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_chunking_covers_and_reconstructs(spark, n_words, chunk, ov_frac, seed):
    """Any (doc length, chunk size, overlap): chunk ids are dense from
    0, every chunk respects the token budget, and stripping the
    overlap from chunks 1..k reconstructs the document exactly."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.text import (
        chunk_documents,
    )

    overlap = min(int(chunk * ov_frac), chunk - 1)
    rng = np.random.default_rng(seed)
    words = [f"w{rng.integers(0, 50)}" for _ in range(n_words)]
    text = " ".join(words)
    sdf = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = (
        chunk_documents(sdf, chunk_tokens=chunk, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r.chunk_id for r in out] == list(range(len(out)))
    assert all(r.n_tokens <= chunk for r in out)
    toks = [r.chunk_text.split(" ") for r in out]
    rebuilt = toks[0] + [t for c in toks[1:] for t in c[overlap:]]
    expected = words if words else [""]  # empty text -> one empty token
    assert rebuilt == expected


@given(
    words=st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=40),
)
@settings(**_SETTINGS)
def test_repetition_ratio_matches_python_oracle(spark, words):
    """dup_ngram_ratio equals a direct python computation and stays in
    [0, 1) for any word sequence."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.text import (
        repetition_stats,
    )

    text = " ".join(words)
    sdf = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = repetition_stats(sdf, text_col="text", n=2).collect()[0]
    toks = text.split(" ") if text else [""]
    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    assert row.n_ngrams == len(grams)
    assert row.n_distinct == len(set(grams))
    exp = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
    assert abs(row.dup_ngram_ratio - exp) < 1e-12
    assert 0.0 <= row.dup_ngram_ratio < 1.0 or row.n_ngrams == 0


@given(
    n_urls=st.integers(min_value=0, max_value=3),
    n_emails=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**_SETTINGS)
def test_scrub_is_idempotent_and_counts(spark, n_urls, n_emails, seed):
    """scrub(scrub(x)) == scrub(x), and the counts match the number of
    planted artifacts."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.text import (
        scrub_text,
    )

    rng = np.random.default_rng(seed)
    parts = ["plain"] * 3
    parts += [f"https://site{rng.integers(0, 9)}.io/p" for _ in range(n_urls)]
    parts += [f"u{rng.integers(0, 9)}@mail.com" for _ in range(n_emails)]
    rng.shuffle(parts)
    text = "  ".join(parts)
    sdf = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = scrub_text(sdf, text_col="text").collect()[0]
    assert row.n_urls == n_urls and row.n_emails == n_emails
    again = scrub_text(
        spark.createDataFrame([(1, row.clean_text)], ["doc_id", "text"]),
        text_col="text",
    ).collect()[0]
    assert again.clean_text == row.clean_text
    assert again.n_urls == 0 and again.n_emails == 0
