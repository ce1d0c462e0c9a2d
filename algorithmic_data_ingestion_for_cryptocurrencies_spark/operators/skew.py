"""Skew-aware join utilities for the 100 TB path.

AQE's skew-join handling (enabled in :mod:`..session`) splits
oversized SORT-MERGE partitions at runtime, but it cannot help when a
*broadcastable-side* join explodes on a handful of hot keys (the
classic hot-shingle / hot-symbol problem called out in SURVEY §7.1 and
VERDICT r1). :func:`salted_join` is the explicit fix: replicate the
small side ``salt`` ways, scatter the big side's hot keys uniformly
across the replicas, join on (key, salt). Results are identical to the
plain join; the shuffle is balanced by construction.

:func:`top_frequency_keys` finds the hot keys with one cheap
aggregation so callers can salt only when (and where) it matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def top_frequency_keys(
    df: DataFrame, keys: Sequence[str], *, min_count: int
) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — one aggregation
    with map-side combine; the result is small by definition."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("__key_count"))
        .filter(F.col("__key_count") > min_count)
        .drop("__key_count")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``on`` with the hot-key skew broken by
    salting: each big-side row gets a uniform salt in ``[0, salt)``,
    the small side is exploded ``salt`` ways, and the join key becomes
    (key..., salt).

    For big-side-preserving joins (``inner``, ``left``, ``left_semi``,
    ``left_anti``) row multiplicity — and therefore the result — is
    EXACTLY that of the plain join for any salt assignment; the salt
    only changes shuffle placement, so deriving it from the per-row
    monotonic id (nondeterministic across reruns) is harmless.
    ``right``/``full``/``outer`` are REJECTED: an unmatched small-side
    row would surface once per salt replica (ADVICE r2) — and a small
    side needing outer preservation shouldn't be salted anyway (flip
    the sides or dedup the replicas instead)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports big-side-preserving joins {sorted(allowed)}; "
            f"got how={how!r} (small-side rows would duplicate per salt replica)"
        )
    on = list(on)
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()),
        F.lit(salt),
    ).cast("int")
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
