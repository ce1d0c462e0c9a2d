"""Bucketed co-located joins (r10): the write-time clustering must be
visible to the planner — a join of two tables bucketed on the same key
with the same bucket count runs with ZERO exchanges, where the
unbucketed twin pays one per side. This is the lake-level scale lever
for repeated joins on a stable key (fact x dimension at 100 TB)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.lake import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    with tempfile.TemporaryDirectory() as d:
        write_bucketed(
            o, "t_orders_b", buckets=8, bucket_cols=["o_orderkey"],
            sort_cols=["o_orderkey"], path=f"{d}/orders",
        )
        write_bucketed(
            li, "t_lineitem_b", buckets=8, bucket_cols=["l_orderkey"],
            sort_cols=["l_orderkey"], path=f"{d}/lineitem",
        )
        yield o, li
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _join(spark, left, right):
    # decimal sums: exact regardless of partition/summation order, so
    # bucketed and unbucketed plans must match bit-for-bit
    return left.join(
        right, left["o_orderkey"] == right["l_orderkey"]
    ).groupBy("o_custkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    # broadcast would hide the comparison on tiny test data: force the
    # shuffle-family planner path both sides (at fact-table scale
    # neither side broadcasts anyway — that's the regime bucketing is
    # for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"]) \
            .select("o_custkey", "l_extendedprice")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # the unbucketed twin pays an exchange per side
        o, li = bucketed_pair
        plain = o.join(li, o["o_orderkey"] == li["l_orderkey"]) \
            .select("o_custkey", "l_extendedprice")
        p2 = plain._jdf.queryExecution().executedPlan().toString()
        assert p2.count("Exchange") >= 2, p2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_values_match_unbucketed(spark, bucketed_pair):
    o, li = bucketed_pair
    got = _join(spark, spark.table("t_orders_b"), spark.table("t_lineitem_b"))
    want = _join(spark, o, li)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bucketed_aggregate_reuses_clustering(spark, bucketed_pair):
    """A groupBy on the bucket key also skips its exchange — the
    clustering pays off beyond joins."""
    agg = spark.table("t_lineitem_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
