"""Stateful streaming continuity (SURVEY §2 ST3) — the reference's
``StatefulTAProcessor`` (``algo-data-ingestion/app/features/processors/
stateful_processor.py:11-41``): process chunks/micro-batches of a
series while carrying the trailing ``window-1`` rows so rolling
features are identical to a full-batch run (equivalence asserted by
``tests/features/processors/test_stateful_processor.py:19-37``).

Spark mapping: ``applyInPandasWithState`` — state is the trailing-row
buffer keyed by series, the engine manages the state store /
checkpointing. The same chunk-combining core also powers a batch
harness (:func:`chunked_rolling_mean_batch`) used by the equivalence
test.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _combine_with_carry(pdf: pd.DataFrame, carry: pd.DataFrame | None,
                        value_col: str, window: int, out_col: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Core chunk step: prepend carried rows, compute the rolling op,
    emit only the new rows, return the new trailing carry."""
    full = pd.concat([carry, pdf], ignore_index=True) if carry is not None and len(carry) else pdf
    full = full.sort_values("ts").reset_index(drop=True)
    rolled = full[value_col].rolling(window).mean()
    n_new = len(pdf)
    out = full.iloc[len(full) - n_new:].copy()
    out[out_col] = rolled.iloc[len(full) - n_new:].values
    new_carry = full.iloc[max(0, len(full) - (window - 1)):][["ts", value_col]]
    return out, new_carry


def stateful_rolling_mean(
    value_col: str,
    window: int,
    key_cols: Sequence[str],
    out_col: str = "rolling_mean",
):
    """Build the ``applyInPandasWithState`` function: carries the last
    ``window - 1`` rows per key across micro-batches."""

    def fn(key, pdf_iter, state: GroupState):
        carry = None
        if state.exists:
            (ts_list, val_list) = state.get
            carry = pd.DataFrame({"ts": pd.to_datetime(list(ts_list)), value_col: list(val_list)})
        outs = []
        for pdf in pdf_iter:
            out, carry = _combine_with_carry(pdf, carry, value_col, window, out_col)
            outs.append(out)
        state.update((
            [t.isoformat() for t in carry["ts"]],
            [float(v) for v in carry[value_col]],
        ))
        for out in outs:
            for i, k in enumerate(key_cols):
                out[k] = key[i]
            yield out

    return fn


def apply_stateful_rolling_mean(
    stream_df,
    *,
    keys: Sequence[str],
    value_col: str = "value",
    window: int = 5,
    out_col: str = "rolling_mean",
    extra_out_cols: str = "",
):
    """Wire the stateful op onto a (streaming) DataFrame grouped by
    ``keys``. Output schema: keys + ts + value + rolling col. Key
    types are taken from the input schema (round-1 version hardcoded
    ``long`` keys, breaking string-keyed series)."""
    key_schema = ", ".join(
        f"{k} {stream_df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = f"ts timestamp, {value_col} double{extra_out_cols}, {out_col} double, {key_schema}"
    state_schema = "ts array<string>, vals array<double>"
    return stream_df.groupBy(*keys).applyInPandasWithState(
        stateful_rolling_mean(value_col, window, list(keys), out_col),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _ewm_combine_with_carry(
    pdf: pd.DataFrame, carry: tuple[float, float] | None,
    value_col: str, span: int, out_col: str,
) -> tuple[pd.DataFrame, tuple[float, float]]:
    """EWM chunk step with EXACT continuation (pandas adjust=True).

    adjust=True EWM is y_t = num_t / den_t with num_t = x_t + q·num_{t-1}
    and den_t = 1 + q·den_{t-1} (q = 1-α). Carrying (num, den) at the
    chunk boundary therefore continues the recursion exactly:
      num_t = chunk_num_t + q^{t+1}·num0,   den_t = chunk_den_t + q^{t+1}·den0
    where chunk_num/den are the chunk-local EWM pieces, recovered
    STABLY from pandas' own O(n) chunk EWM (chunk_num = y_chunk·chunk_den,
    chunk_den = (1-q^{t+1})/(1-q)) — no q^{-i} terms, so no overflow at
    any chunk length (q^{t+1} underflows gracefully to 0).
    Generalizes the reference's ``StatefulTAProcessor`` carry beyond
    rolling windows (``stateful_processor.py:11-41``)."""
    import numpy as np

    pdf = pdf.sort_values("ts").reset_index(drop=True)
    alpha = 2.0 / (span + 1.0)
    q = 1.0 - alpha
    x = pdf[value_col].to_numpy(dtype="float64")
    t = np.arange(1, len(x) + 1, dtype="float64")  # t+1 with 0-based t
    qpow = q ** t
    chunk_den = (1.0 - qpow) / (1.0 - q)
    y_chunk = pd.Series(x).ewm(span=span, adjust=True).mean().to_numpy()
    chunk_num = y_chunk * chunk_den
    num0, den0 = carry if carry is not None else (0.0, 0.0)
    num = chunk_num + qpow * num0
    den = chunk_den + qpow * den0
    out = pdf.copy()
    out[out_col] = num / den
    new_carry = (float(num[-1]), float(den[-1])) if len(x) else (num0, den0)
    return out, new_carry


def stateful_ewm(
    value_col: str,
    span: int,
    key_cols: Sequence[str],
    out_col: str = "ewm",
):
    """``applyInPandasWithState`` function carrying the (num, den)
    EWM accumulator pair per key — O(1) state per series vs the
    rolling family's window-1 row buffer."""

    def fn(key, pdf_iter, state: GroupState):
        carry = tuple(state.get) if state.exists else None
        outs = []
        for pdf in pdf_iter:
            out, carry = _ewm_combine_with_carry(pdf, carry, value_col, span, out_col)
            outs.append(out)
        if carry is not None:
            state.update(carry)
        for out in outs:
            for i, k in enumerate(key_cols):
                out[k] = key[i]
            yield out[["ts", value_col, out_col, *key_cols]]

    return fn


def apply_stateful_ewm(
    stream_df,
    *,
    keys: Sequence[str],
    value_col: str = "value",
    span: int = 12,
    out_col: str = "ewm",
):
    """Wire exact-continuation EWM onto a (streaming) DataFrame grouped
    by ``keys``. State is two doubles per key."""
    key_schema = ", ".join(
        f"{k} {stream_df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = f"ts timestamp, {value_col} double, {out_col} double, {key_schema}"
    state_schema = "num double, den double"
    return stream_df.groupBy(*keys).applyInPandasWithState(
        stateful_ewm(value_col, span, list(keys), out_col),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def chunked_ewm_batch(
    pdf: pd.DataFrame,
    chunk_size: int,
    *,
    value_col: str = "value",
    span: int = 12,
    out_col: str = "ewm",
) -> pd.DataFrame:
    """Batch harness over the EWM carry core (chunked == full-batch
    equivalence twin of :func:`chunked_rolling_mean_batch`)."""
    carry = None
    outs = []
    for lo in range(0, len(pdf), chunk_size):
        out, carry = _ewm_combine_with_carry(
            pdf.iloc[lo:lo + chunk_size], carry, value_col, span, out_col
        )
        outs.append(out)
    return pd.concat(outs, ignore_index=True)


def chunked_rolling_mean_batch(
    pdf: pd.DataFrame,
    chunk_size: int,
    *,
    value_col: str = "value",
    window: int = 5,
    out_col: str = "rolling_mean",
) -> pd.DataFrame:
    """Batch harness over the same carry core — lets tests assert
    chunked-with-state == full-batch (the reference's invariance
    test, ``test_stateful_processor.py:19-37``)."""
    carry = None
    outs = []
    for lo in range(0, len(pdf), chunk_size):
        chunk = pdf.iloc[lo:lo + chunk_size]
        out, carry = _combine_with_carry(chunk, carry, value_col, window, out_col)
        outs.append(out)
    return pd.concat(outs, ignore_index=True)
