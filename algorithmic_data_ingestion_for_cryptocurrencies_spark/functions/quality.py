"""Declarative data-quality constraints (Deequ-style, engine-native).

The reference validates payloads row-by-row in Pydantic
(``algo-data-ingestion/app/schemas``); at 100 TB validation must be a
QUERY: every constraint compiles to an aggregate expression and the
whole suite evaluates in ONE pass over the table (plus one tiny
aggregate per uniqueness/referential rule, which need their own
grouping). The report is a small DataFrame — persist it next to the
data, alert on ``passed = false``.

Constraint vocabulary (mirrors the common Deequ checks):

- ``not_null(col)`` — no NULLs
- ``unique(cols)`` — (cols) is a key
- ``in_range(col, lo, hi)`` — values within [lo, hi]
- ``values_in(col, allowed)`` — categorical domain
- ``matches(col, regex)`` — pattern conformance
- ``min_rows(n)`` — table not unexpectedly empty/truncated
- ``ref_integrity(col, ref_df, ref_col)`` — FK containment
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F


@dataclass
class _Rule:
    name: str
    kind: str
    params: dict[str, Any] = field(default_factory=dict)


class ConstraintSuite:
    """Collect rules, then :meth:`run` them against a frame."""

    def __init__(self):
        self._rules: list[_Rule] = []

    def not_null(self, col: str) -> "ConstraintSuite":
        self._rules.append(_Rule(f"not_null({col})", "not_null", {"col": col}))
        return self

    def unique(self, *cols: str) -> "ConstraintSuite":
        self._rules.append(
            _Rule(f"unique({', '.join(cols)})", "unique", {"cols": list(cols)})
        )
        return self

    def in_range(self, col: str, lo, hi) -> "ConstraintSuite":
        self._rules.append(
            _Rule(f"in_range({col}, {lo}, {hi})", "in_range",
                  {"col": col, "lo": lo, "hi": hi})
        )
        return self

    def values_in(self, col: str, allowed) -> "ConstraintSuite":
        self._rules.append(
            _Rule(f"values_in({col})", "values_in",
                  {"col": col, "allowed": list(allowed)})
        )
        return self

    def matches(self, col: str, pattern: str) -> "ConstraintSuite":
        self._rules.append(
            _Rule(f"matches({col})", "matches", {"col": col, "pattern": pattern})
        )
        return self

    def min_rows(self, n: int) -> "ConstraintSuite":
        self._rules.append(_Rule(f"min_rows({n})", "min_rows", {"n": n}))
        return self

    def ref_integrity(
        self, col: str, ref_df: DataFrame, ref_col: str, ref_name: str = "ref"
    ) -> "ConstraintSuite":
        self._rules.append(
            _Rule(f"ref_integrity({col} -> {ref_name}.{ref_col})",
                  "ref_integrity",
                  {"col": col, "ref_df": ref_df, "ref_col": ref_col})
        )
        return self

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate the suite. All row-local rules fold into ONE
        aggregate over ``df`` (violation counts as conditional sums);
        each ``unique`` adds one bounded group-count aggregate and
        each ``ref_integrity`` one left-anti count. Returns
        ``(rule, passed, violations, checked)`` — ``violations`` is
        the offending row/group count, ``checked`` the denominator."""
        spark = df.sparkSession
        simple_aggs: list[F.Column] = [F.count(F.lit(1)).alias("__total")]
        simple_rules: list[_Rule] = []
        for r in self._rules:
            p = r.params
            if r.kind == "not_null":
                bad = F.col(p["col"]).isNull()
            elif r.kind == "in_range":
                c = F.col(p["col"])
                bad = c.isNull() | (c < p["lo"]) | (c > p["hi"])
            elif r.kind == "values_in":
                c = F.col(p["col"])
                bad = c.isNull() | ~c.isin(p["allowed"])
            elif r.kind == "matches":
                c = F.col(p["col"])
                bad = c.isNull() | ~c.rlike(p["pattern"])
            elif r.kind in ("unique", "ref_integrity", "min_rows"):
                continue
            else:  # pragma: no cover
                raise ValueError(f"unknown rule kind {r.kind}")
            simple_rules.append(r)
            simple_aggs.append(
                F.sum(bad.cast("long")).alias(f"__v_{len(simple_rules) - 1}")
            )
        base = df.agg(*simple_aggs).first()
        total = base["__total"]

        rows: list[tuple] = []
        for i, r in enumerate(simple_rules):
            v = base[f"__v_{i}"] or 0
            rows.append((r.name, v == 0, v, total))
        for r in self._rules:
            p = r.params
            if r.kind == "min_rows":
                rows.append((r.name, total >= p["n"], max(0, p["n"] - total), total))
            elif r.kind == "unique":
                dup_groups = (
                    df.groupBy(*p["cols"]).count().filter(F.col("count") > 1).count()
                )
                rows.append((r.name, dup_groups == 0, dup_groups, total))
            elif r.kind == "ref_integrity":
                orphans = (
                    df.select(F.col(p["col"]))
                    .filter(F.col(p["col"]).isNotNull())
                    .join(
                        p["ref_df"].select(
                            F.col(p["ref_col"]).alias(p["col"])
                        ).distinct(),
                        p["col"],
                        "left_anti",
                    )
                    .count()
                )
                rows.append((r.name, orphans == 0, orphans, total))
        return spark.createDataFrame(
            rows, "rule string, passed boolean, violations long, checked long"
        )
