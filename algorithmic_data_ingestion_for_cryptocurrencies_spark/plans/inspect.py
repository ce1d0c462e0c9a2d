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


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in the formatted plan's scan node
    (PushedFilters / PartitionFilters / ReadSchema checks)."""
    plan = explain_str(df, "formatted")
    missing = [f for f in fragments if f not in plan]
    if missing:
        raise AssertionError(f"plan fragments not found: {missing}\n\n{plan}")
