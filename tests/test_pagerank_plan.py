"""Plan-shape pin for the r9 Pregel-style pagerank: the |E|-row edge
cache is STATIONARY — each iteration shuffles only the O(N) rank rows
into the edges' hash partitioning, never the edges themselves (the
pre-r9 shape re-shuffled the weighted edge list every round, 3x the
dominant data motion at sf30: interleaved A/B 316.7 s -> 103.6 s)."""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.graph import pagerank
from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str


def _edges(spark):
    return spark.range(0, 2000).select(
        (F.col("id") % 97).alias("src"),
        (F.col("id") % 31 + 1000).alias("dst"),
    )


def test_pagerank_edges_cached_and_never_reshuffled(spark):
    plans: list[str] = []
    pagerank(
        _edges(spark), iterations=2,
        plan_probe=lambda df: plans.append(explain_str(df, "formatted")),
    )
    assert len(plans) == 2
    for plan in plans:
        # edge side must come from the build-time cache...
        assert "InMemoryTableScan" in plan
        # ...and must not be re-exchanged per round: the only frame
        # carrying `dst` before the aggregate's partial combine is the
        # |E|-row edge list, so no Exchange may hash on dst columns
        for ln in plan.splitlines():
            if "Exchange hashpartitioning" in ln:
                assert "dst" not in ln, f"edge frame re-exchanged: {ln}"


def test_pagerank_matches_hand_values(spark):
    # tiny deterministic graph, hand-checkable semantics: one round of
    # uniform mass over out-degrees, dangling mass dropped
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=1).collect()}
    n = 3
    base = 0.15 / n
    assert abs(pr["a"] - base) < 1e-12
    assert abs(pr["b"] - (base + 0.85 * (1 / n) / 2)) < 1e-12
    assert abs(pr["c"] - (base + 0.85 * ((1 / n) / 2 + (1 / n) / 1))) < 1e-12
