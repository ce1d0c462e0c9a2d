"""Vectorized backtest operator (SURVEY §2 U6): hand-computed fixture
parity for the curve columns, and summary-stat invariants."""

import math

import pytest
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.backtest import (
    backtest_positions,
    backtest_summary,
)


@pytest.fixture(scope="module")
def curve(spark):
    # one series: flat -> long at bar 1 -> flat at bar 3 -> long at 4
    rows = [
        # ts, close, position
        (0, 100.0, 0),
        (1, 110.0, 1),   # enter long (fee), earns from bar 2
        (2, 121.0, 1),
        (3, 108.9, 0),   # exit (fee), still earned bar 3's return
        (4, 108.9, 1),   # re-enter
        (5, 119.79, 1),
    ]
    df = spark.createDataFrame(rows, ["ts", "close", "position"]) \
        .withColumn("key", F.lit("s1"))
    return backtest_positions(
        df, keys=["key"], order="ts",
        price_col="close", position_col="position", fee_bps=10.0,
    )


FEE = 10.0 / 1e4


def _expected():
    closes = [100.0, 110.0, 121.0, 108.9, 108.9, 119.79]
    poss = [0, 1, 1, 0, 1, 1]
    strat, eq, peak, dd = [], [], [], []
    e = 0.0
    for i, (c, p) in enumerate(zip(closes, poss)):
        prev_p = poss[i - 1] if i else 0
        r = c / closes[i - 1] - 1 if i else None
        s = (prev_p * r if r is not None else 0.0) - FEE * abs(p - prev_p)
        strat.append(s)
        e += math.log1p(s)
        eq.append(math.exp(e))
        peak.append(max(eq))
        dd.append(eq[-1] / peak[-1] - 1)
    return strat, eq, dd


def test_curve_matches_hand_computation(curve):
    strat, eq, dd = _expected()
    got = curve.orderBy("ts").collect()
    for i, row in enumerate(got):
        assert row["strategy_ret"] == pytest.approx(strat[i], rel=1e-12)
        assert row["equity"] == pytest.approx(eq[i], rel=1e-12)
        assert row["drawdown"] == pytest.approx(dd[i], rel=1e-12)
    # trades: entries at 1 and 4, exit at 3
    assert [r["trade"] for r in got] == [0, 1, 0, 1, 1, 0]


def test_summary_matches_curve(curve):
    strat, eq, dd = _expected()
    row = backtest_summary(curve, keys=["key"]).collect()[0]
    assert row["n_bars"] == 6
    assert row["n_trades"] == 3.0
    assert row["total_return"] == pytest.approx(eq[-1] - 1, rel=1e-12)
    assert row["max_drawdown"] == pytest.approx(min(dd), rel=1e-12)
    mean = sum(strat) / len(strat)
    var = sum((s - mean) ** 2 for s in strat) / (len(strat) - 1)
    assert row["sharpe"] == pytest.approx(mean / math.sqrt(var), rel=1e-12)


def test_flat_series_has_null_sharpe_and_zero_return(spark):
    df = spark.createDataFrame(
        [(t, 100.0, 0) for t in range(4)], ["ts", "close", "position"]
    )
    out = backtest_summary(
        backtest_positions(
            df, keys=[], order="ts", price_col="close",
            position_col="position", fee_bps=10.0,
        ),
        keys=[],
    ).collect()[0]
    assert out["n_trades"] == 0.0
    assert out["total_return"] == pytest.approx(0.0, abs=1e-15)
    assert out["max_drawdown"] == pytest.approx(0.0, abs=1e-15)
    assert out["sharpe"] is None
