"""Watermarked stream-stream join (beyond the reference's streaming
surface — its adapters only ever consume ONE live feed at a time and
align others in batch; ``algo-data-ingestion/app/adapters`` has no
stream-pair correlation). At engine scale the natural ask is "match
trades to the order-book snapshot / news burst within N minutes, as
both arrive" — Spark's stream-stream inner join with event-time range
bounds is the scale shape for that: both sides' state is bounded by
the watermark + the join's time window, keyed state co-partitions on
the join key, and late rows beyond the watermark age out instead of
growing state forever.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``keys`` where the right event lands
    within ``[left_ts - max_lag, left_ts]`` — "the latest right-side
    context no older than max_lag", the streaming twin of a bounded
    backward as-of. ``how="left_outer"`` additionally emits unmatched
    left rows (right columns null) once the right watermark passes
    their window — i.e. "no context arrived in time" becomes an
    explicit row instead of a silent drop, which is what an alerting
    consumer wants.

    State bounds (the 100 TB property): BOTH sides carry a watermark
    and the join condition bounds the time distance, so Spark can
    evict matched/expired rows — state per key is O(events within
    watermark + lag), independent of stream lifetime. Without the
    range condition the right side would be retained forever.

    Output may contain multiple right matches per left row (all
    within the lag window); compose with a downstream aggregate
    (``max_by(.., r_ts)``) for exactly-the-latest semantics — kept
    out of this operator so the join stays append-mode composable.
    """
    keys = list(keys)
    lt = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")) \
        .withWatermark(left_ts, watermark)
    rt = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")) \
        .withWatermark(right_ts, watermark)
    rt = rt.select(
        *[F.col(k).alias(f"{right_prefix}{k}") for k in keys],
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    # the time RANGE must be part of the join condition itself — that
    # is what lets Spark derive the state-eviction watermark for both
    # sides (a post-join filter would leave the right side's state
    # unbounded per the stream-stream join state-cleanup rules)
    r_ts = F.col(f"{right_prefix}{right_ts}")
    cond = (
        (r_ts >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (r_ts <= F.col(left_ts))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"{right_prefix}{k}"))
    return lt.join(rt, on=cond, how=how).drop(
        *[f"{right_prefix}{k}" for k in keys]
    )
