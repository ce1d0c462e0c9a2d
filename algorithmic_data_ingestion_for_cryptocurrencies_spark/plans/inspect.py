"""Plan inspection helpers: the engine's scale discipline is enforced
by *looking at the plan* (predicate pushdown reached the scan, joins
broadcast, windows share a single sort). Tests use these to assert
plan shape, not just results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def estimated_plan_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate for a DataFrame (file bytes for a bare
    scan), or ``None`` when unavailable (e.g. Spark Connect, where the
    driver-side QueryExecution is not reachable).

    This is the LAZY alternative to ``df.rdd.getNumPartitions()`` for
    "is this input too small to parallelize?" gates (r14 advisor +
    verdict #7): it reads the optimized logical plan's statistics —
    no physical planning, no DataFrame->RDD conversion, no job — where
    the ``.rdd`` probe forced a full physical plan + RDD graph build
    on every call.
    """
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
        # py4j maps scala.math.BigInt to a Python int; keep a string
        # round-trip fallback for any bridge that hands back the object
        return size if isinstance(size, int) else int(str(size))
    except Exception:
        return None


def scan_is_effectively_serial(df: DataFrame, parallelism: int) -> bool:
    """True when the optimizer's size estimate says the input scans to
    (far) fewer splits than ``parallelism`` — i.e. a round-robin
    repartition would unlock idle cores rather than add a shuffle.
    Uses the session's actual ``spark.sql.files.maxPartitionBytes`` as
    the split size, so the gate mirrors the scan planner's own math.
    Falls back to False (never add a shuffle) when stats or the conf
    are unreachable, so at-scale inputs and Connect sessions are
    untouched."""
    size = estimated_plan_bytes(df)
    if size is None:
        return False
    try:
        split = int(
            df.sparkSession._jsparkSession.sessionState()  # noqa: SLF001
            .conf()
            .filesMaxPartitionBytes()
        )
    except Exception:
        split = 128 * 1024 * 1024
    # ceil(size / split) is the scan planner's upper bound on split
    # count for splittable files; below parallelism the scan cannot
    # occupy the cluster
    return -(-size // max(split, 1)) < parallelism


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the formatted plan's scan node
    (PushedFilters / PartitionFilters / ReadSchema checks)."""
    plan = explain_str(df, "formatted")
    missing = [f for f in fragments if f not in plan]
    if missing:
        raise AssertionError(f"plan fragments not found: {missing}\n\n{plan}")
