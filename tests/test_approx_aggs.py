"""Approximate-aggregate accuracy: HLL distinct counts within 5% of
exact, approx median within 1% of the exact percentile (the rows-only
`agg_approx` query's accuracy contract)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_aggs_accuracy(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
            F.percentile_approx("l_extendedprice", 0.5).alias("amed"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("emed"),
        )
        .collect()
    )
    assert len(got) >= 2
    for r in got:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05
        assert abs(r["amed"] - r["emed"]) / r["emed"] < 0.01
