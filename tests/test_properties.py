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
