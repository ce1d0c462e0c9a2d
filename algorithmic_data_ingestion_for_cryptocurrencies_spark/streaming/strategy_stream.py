"""Live-trading-loop stateful operator: SMA-crossover signal ->
forward-filled position -> fee-aware equity curve, continued exactly
across micro-batches in ONE ``applyInPandasWithState`` stage.

Chaining two stateful stages (signal, then backtest) would need two
grouped stateful operators in one streaming query; fusing them keeps
the pipeline a single stage with a single state struct. State per
series is bounded: the trailing ``slow`` (ts, close) rows (enough
history for both SMAs and the crossover diff) plus the O(1) backtest
scalars — independent of stream length.

Semantics mirror the batch pair
``operators/signals.py:with_sma_crossover_signals`` →
``operators/backtest.py:backtest_positions`` bar for bar
(chunked == batch pytest at rtol 1e-12, plus a real micro-batch run):

- masked SMAs (NaN until the window fills), NULL-faithful crossover
  (the first valid ``fast>slow`` emits no signal, matching Spark's
  NULL diff — pandas' NaN-compares-False would fabricate an entry)
- position = last signal forward-filled, seeded from the carried
  position so a hold survives chunk boundaries
- curve continuation via the :mod:`backtest_stream` carry core
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from .backtest_stream import _bt_combine_with_carry, _ordered_chunks

try:  # pyspark >= 3.4
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
except ImportError:  # pragma: no cover - older layout
    from pyspark.sql.streaming import GroupState, GroupStateTimeout  # type: ignore


def _sma_left_fold(close: pd.Series, w: int) -> pd.Series:
    """Trailing SMA with the window summed LEFT-TO-RIGHT — bit-identical
    to Spark's window ``AVG`` (``SlidingWindowFunctionFrame``
    re-evaluates each frame in row order: ``((0 + v0) + v1) + ...``),
    so the streamed signals reproduce the batch operator pair EXACTLY
    instead of to within an ulp. pandas' ``rolling().mean()`` is a
    sliding add/subtract accumulator whose drift can flip a near-tie
    ``fast > slow`` crossover (the reason st17 used to be a rows-only
    oracle row). One vector add per window offset keeps the fold
    vectorized: O(n·w) flops, same as Spark's own re-evaluation."""
    vals = close.to_numpy(dtype="float64")
    out = np.full(len(vals), np.nan)
    if len(vals) >= w:
        windows = np.lib.stride_tricks.sliding_window_view(vals, w)
        acc = np.zeros(len(windows))
        for j in range(w):
            acc = acc + windows[:, j]
        out[w - 1:] = acc / w
    return pd.Series(out, index=close.index)


def _signals_frame(
    close: pd.Series, fast: int, slow: int
) -> tuple[pd.Series, pd.Series, pd.Series]:
    """(entry, exit, raw signal) with Spark-NULL-faithful semantics."""
    fast_ma = _sma_left_fold(close, fast)
    slow_ma = _sma_left_fold(close, slow)
    above = pd.Series(
        np.where(
            fast_ma.isna() | slow_ma.isna(), np.nan,
            (fast_ma > slow_ma).astype(float),
        ),
        index=close.index,
    )
    crossed = above.diff()
    # Spark's (crossed == 1).cast(int) is NULL while the SMAs warm up
    # (null == 1 -> null), not 0 — keep the nullable semantics
    entry = crossed.eq(1).astype("int32").mask(crossed.isna()).astype("Int32")
    exit_ = crossed.eq(-1).astype("int32").mask(crossed.isna()).astype("Int32")
    sig = pd.Series(np.nan, index=close.index)
    sig[crossed == 1] = 1.0
    sig[crossed == -1] = 0.0
    return entry, exit_, sig


def _strategy_combine(
    pdf: pd.DataFrame,
    carry: dict | None,
    *,
    fast: int,
    slow: int,
    fee: float,
    price_col: str = "close",
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
) -> tuple[pd.DataFrame, dict]:
    """Chunk step: recompute signals over (carried tail + chunk), emit
    the chunk's bars with position + curve, return the new carry.
    ``sort_cols`` supplies tiebreak columns when ``ts_col`` alone is
    not unique; the sort is STABLE so tied bars order
    deterministically (matching ``_bt_combine_with_carry``)."""
    pdf = pdf.sort_values(
        list(sort_cols) if sort_cols else ts_col, kind="stable"
    ).reset_index(drop=True)
    if carry is not None and len(carry["closes"]):
        prefix = pd.DataFrame({
            ts_col: pd.to_datetime(carry["ts"]),
            price_col: carry["closes"],
        })
        full_close = pd.concat(
            [prefix[price_col], pdf[price_col].astype(float)],
            ignore_index=True,
        )
        p = len(prefix)
        last_pos = carry["last_pos"]
        bt_carry = carry["bt"]
    else:
        full_close = pdf[price_col].astype(float).reset_index(drop=True)
        p = 0
        last_pos = 0.0
        bt_carry = None
    entry, exit_, sig = _signals_frame(full_close, fast, slow)
    position = sig.ffill().fillna(last_pos)

    out = pdf.copy()
    out["entry_sig"] = entry.iloc[p:].reset_index(drop=True)
    out["exit_sig"] = exit_.iloc[p:].reset_index(drop=True)
    out["position"] = position.iloc[p:].astype("int64").to_numpy()
    out, new_bt = _bt_combine_with_carry(
        out, bt_carry, price_col=price_col, position_col="position",
        fee=fee, ts_col=ts_col, sort_cols=sort_cols,
    )
    tail = pd.concat(
        [pd.DataFrame({ts_col: pd.to_datetime(carry["ts"]),
                       price_col: carry["closes"]}) if p else
         pdf[[ts_col, price_col]].iloc[:0],
         pdf[[ts_col, price_col]]],
        ignore_index=True,
    ).iloc[-slow:]
    new_carry = {
        "ts": [t.isoformat() for t in pd.to_datetime(tail[ts_col])],
        "closes": [float(v) for v in tail[price_col]],
        "last_pos": float(position.iloc[-1]),
        "bt": new_bt,
    }
    return out, new_carry


def chunked_strategy_batch(
    pdf: pd.DataFrame,
    chunk_size: int,
    *,
    fast: int = 10,
    slow: int = 50,
    fee_bps: float = 0.0,
    price_col: str = "close",
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
) -> pd.DataFrame:
    """Batch harness over the fused carry core (chunked == full-batch
    equivalence twin). NOTE: chunks are taken from ``pdf`` in its GIVEN
    row order; pass a pre-sorted frame (the sort inside the carry core
    is per-chunk)."""
    fee = fee_bps / 1e4
    carry = None
    outs = []
    for lo in range(0, len(pdf), chunk_size):
        out, carry = _strategy_combine(
            pdf.iloc[lo:lo + chunk_size], carry, fast=fast, slow=slow,
            fee=fee, price_col=price_col, ts_col=ts_col,
            sort_cols=sort_cols,
        )
        outs.append(out)
    return pd.concat(outs, ignore_index=True)


_BT_FIELDS = ("last_close", "last_position", "cum_logeq", "peak_equity")


def apply_stateful_sma_strategy(
    stream_df,
    *,
    keys: Sequence[str],
    fast: int = 10,
    slow: int = 50,
    fee_bps: float = 0.0,
    price_col: str = "close",
    ts_col: str = "ts",
    sort_cols: Sequence[str] | None = None,
    batch_order: str = "buffer",
):
    """Wire the fused signal+backtest onto a (streaming) DataFrame
    grouped by ``keys``.

    ``batch_order`` governs micro-batch consumption (see
    :func:`backtest_stream._ordered_chunks`): ``"buffer"`` (default)
    concatenates and sorts the group's chunks once — tolerant of
    arbitrary within-batch row order, peak memory O(micro-batch);
    ``"chunk"`` folds and emits chunk-by-chunk through the same carry
    core — peak memory O(Arrow chunk), the backfill-safe mode — and
    fails loudly if the batch is not chunk-ordered. Ordering ACROSS
    triggers is an in-order-arrival assumption either way — enforce
    upstream. Pass ``sort_cols`` when ``ts_col`` alone is not unique
    per series."""
    fee = fee_bps / 1e4
    key_cols = list(keys)

    def fn(key, pdf_iter, state: GroupState):
        carry = None
        if state.exists:
            (ts_list, closes, last_pos, *bt_vals) = state.get
            carry = {
                "ts": list(ts_list), "closes": list(closes),
                "last_pos": last_pos,
                "bt": dict(zip(_BT_FIELDS, bt_vals)),
            }
        emitted = False
        for pdf in _ordered_chunks(
            pdf_iter, batch_order=batch_order,
            cols=sort_cols if sort_cols else [ts_col],
        ):
            out, carry = _strategy_combine(
                pdf, carry, fast=fast, slow=slow, fee=fee,
                price_col=price_col, ts_col=ts_col, sort_cols=sort_cols,
            )
            for i, k in enumerate(key_cols):
                out[k] = key[i]
            emitted = True
            yield out
        if emitted:
            state.update((
                carry["ts"], carry["closes"], carry["last_pos"],
                *[carry["bt"][f] for f in _BT_FIELDS],
            ))

    return _wire(stream_df, fn, key_cols, price_col, ts_col)


def _wire(stream_df, fn, key_cols, price_col, ts_col):
    key_schema = ", ".join(
        f"{k} {stream_df.schema[k].dataType.simpleString()}" for k in key_cols
    )
    out_schema = (
        f"{ts_col} timestamp, {price_col} double, "
        "entry_sig int, exit_sig int, position long, trade double, "
        "strategy_ret double, equity double, drawdown double, "
        + key_schema
    )
    state_schema = (
        "ts array<string>, closes array<double>, last_pos double, "
        "last_close double, last_position double, "
        "cum_logeq double, peak_equity double"
    )
    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
