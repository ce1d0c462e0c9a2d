"""Streaming backtest: per-series equity-curve continuation across
micro-batches (the ST-surface twin of ``operators/backtest.py``).

A live strategy needs the SAME curve the batch backtest produces,
updated as bars arrive. The recursion depends on history only through
four scalars — last close, last position, the cumulative log-equity,
and the running equity peak — so the state per series is O(1)
regardless of history length, and every emitted bar is exactly what
``backtest_positions`` would compute over the full series
(chunked == batch pytest, plus a real ``applyInPandasWithState``
micro-batch equivalence test).

Semantics mirror ``operators/backtest.py:backtest_positions``
(close-to-close fills, lag-1 earning, bps fees on position changes,
``exp(cumsum(log1p))`` equity, drawdown from the running peak). One
divergence is impossible-by-construction data: a per-bar strategy
return <= -1 (price to zero while long) is NULL-skipped by the batch
window sum but propagates -inf here; positive prices keep strat > -1.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
except ImportError:  # pragma: no cover - older layout
    from pyspark.sql.streaming import GroupState, GroupStateTimeout  # type: ignore

_CARRY_FIELDS = ("last_close", "last_position", "cum_logeq", "peak_equity")


def _bt_combine_with_carry(
    pdf: pd.DataFrame,
    carry: dict | None,
    *,
    price_col: str = "close",
    position_col: str = "position",
    fee: float = 0.0,
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
) -> tuple[pd.DataFrame, dict]:
    """Chunk step: continue the curve from the carried scalars, emit
    the chunk's bars, return the new carry. ``sort_cols`` overrides
    the within-chunk ordering when ``ts_col`` alone is not unique
    (tiebreak columns must match the batch operator's ``order``).
    The sort is STABLE so that rows tied on every sort column keep
    their incoming order deterministically (pandas' default quicksort
    would permute ties run-to-run)."""
    pdf = pdf.sort_values(
        list(sort_cols) if sort_cols else ts_col, kind="stable"
    ).reset_index(drop=True)
    close = pdf[price_col].astype(float)
    pos = pdf[position_col].astype(float)
    prev_close = close.shift(1)
    prev_pos = pos.shift(1)
    if carry is not None:
        prev_close.iloc[0] = carry["last_close"]
        prev_pos.iloc[0] = carry["last_position"]
        cum0, peak0 = carry["cum_logeq"], carry["peak_equity"]
    else:
        prev_pos.iloc[0] = 0.0
        cum0, peak0 = 0.0, 0.0  # equity > 0, so a 0.0 seed never wins
    ret = close / prev_close - 1
    trade = (pos - prev_pos).abs()
    strat = (prev_pos * ret).fillna(0.0) - fee * trade
    cum = np.log1p(strat).cumsum() + cum0
    equity = np.exp(cum)
    peak = np.maximum.accumulate(np.maximum(equity.to_numpy(), peak0))
    out = pdf.copy()
    out["trade"] = trade
    out["strategy_ret"] = strat
    out["equity"] = equity
    out["drawdown"] = equity.to_numpy() / peak - 1
    new_carry = {
        "last_close": float(close.iloc[-1]),
        "last_position": float(pos.iloc[-1]),
        "cum_logeq": float(cum.iloc[-1]),
        "peak_equity": float(peak[-1]),
    }
    return out, new_carry


def chunked_backtest_batch(
    pdf: pd.DataFrame,
    chunk_size: int,
    *,
    price_col: str = "close",
    position_col: str = "position",
    fee_bps: float = 0.0,
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
) -> pd.DataFrame:
    """Batch harness over the carry core (chunked == full-batch
    equivalence twin, same pattern as ``chunked_ewm_batch``).
    NOTE: chunks are taken from ``pdf`` in its GIVEN row order; pass
    a pre-sorted frame (the sort inside the carry core is per-chunk)."""
    fee = fee_bps / 1e4
    carry = None
    outs = []
    for lo in range(0, len(pdf), chunk_size):
        out, carry = _bt_combine_with_carry(
            pdf.iloc[lo:lo + chunk_size], carry,
            price_col=price_col, position_col=position_col,
            fee=fee, ts_col=ts_col, sort_cols=sort_cols,
        )
        outs.append(out)
    return pd.concat(outs, ignore_index=True)


def stateful_backtest(
    key_cols: Sequence[str],
    *,
    price_col: str = "close",
    position_col: str = "position",
    fee_bps: float = 0.0,
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
):
    """Build the ``applyInPandasWithState`` function: O(1) carry per
    series (four scalars), exact continuation.

    A group's micro-batch may arrive as MULTIPLE Arrow chunks in
    arbitrary row order, so the chunks are buffered, concatenated and
    sorted ONCE before the carry runs (state is O(1); only the current
    micro-batch is ever held in memory). Ordering ACROSS triggers is an
    in-order-arrival assumption: bars later than anything already
    carried must arrive in a later-or-same trigger — enforce it
    upstream with a watermark or source ordering.

    Memory note: because the chunks are concatenated, peak executor
    memory per group is O(micro-batch), not O(Arrow chunk). An
    unthrottled FIRST trigger over a large backfill therefore holds a
    group's entire history in one pandas frame — bound micro-batches
    at the source for backfill starts (``maxFilesPerTrigger`` /
    ``maxOffsetsPerTrigger``); steady-state triggers are small by
    construction."""
    fee = fee_bps / 1e4

    def fn(key, pdf_iter, state: GroupState):
        carry = dict(zip(_CARRY_FIELDS, state.get)) if state.exists else None
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            return
        pdf = (chunks[0] if len(chunks) == 1
               else pd.concat(chunks, ignore_index=True))
        out, carry = _bt_combine_with_carry(
            pdf, carry, price_col=price_col,
            position_col=position_col, fee=fee, ts_col=ts_col,
            sort_cols=sort_cols,
        )
        state.update(tuple(carry[f] for f in _CARRY_FIELDS))
        for i, k in enumerate(key_cols):
            out[k] = key[i]
        yield out

    return fn


def apply_stateful_backtest(
    stream_df,
    *,
    keys: Sequence[str],
    price_col: str = "close",
    position_col: str = "position",
    fee_bps: float = 0.0,
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
):
    """Wire the stateful backtest onto a (streaming) DataFrame grouped
    by ``keys``. Output: keys + ts + close + position + the four curve
    columns; key types are taken from the input schema. Pass
    ``sort_cols`` (e.g. ``(ts, okey, lnum)``) when ``ts_col`` alone is
    not unique within a series so tied bars order deterministically."""
    key_schema = ", ".join(
        f"{k} {stream_df.schema[k].dataType.simpleString()}" for k in keys
    )
    pos_type = stream_df.schema[position_col].dataType.simpleString()
    out_schema = (
        f"{ts_col} timestamp, {price_col} double, {position_col} {pos_type}, "
        f"trade double, strategy_ret double, equity double, "
        f"drawdown double, {key_schema}"
    )
    state_schema = (
        "last_close double, last_position double, "
        "cum_logeq double, peak_equity double"
    )
    return stream_df.groupBy(*keys).applyInPandasWithState(
        stateful_backtest(
            list(keys), price_col=price_col, position_col=position_col,
            fee_bps=fee_bps, ts_col=ts_col, sort_cols=sort_cols,
        ),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
