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


def test_constraint_suite_detects_each_violation_kind(spark):
    """Every rule kind both passes on clean data and counts the exact
    violations on dirty data."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.functions.quality import (
        ConstraintSuite,
    )

    dirty = spark.createDataFrame(
        [
            (1, 1, "a@x.io", 5.0, "A"),
            (1, 1, "b@x.io", -2.0, "A"),     # dup key + out of range
            (2, 1, None, 3.0, "Z"),          # null email + bad category
            (3, 1, "not-an-email", 4.0, "A"),
        ],
        ["k1", "k2", "email", "score", "cat"],
    )
    ref = spark.createDataFrame([(1,), (2,)], ["k"])  # 3 is an orphan
    report = {
        r["rule"]: r
        for r in (
            ConstraintSuite()
            .not_null("email")
            .in_range("score", 0.0, 10.0)
            .values_in("cat", ["A", "B"])
            .matches("email", r"^[^@\s]+@[^@\s]+\.[a-z]+$")
            .min_rows(10)
            .unique("k1", "k2")
            .ref_integrity("k1", ref, "k")
            .run(dirty)
            .collect()
        )
    }
    assert report["not_null(email)"]["violations"] == 1
    assert report["in_range(score, 0.0, 10.0)"]["violations"] == 1
    assert report["values_in(cat)"]["violations"] == 1
    # matches: null + non-email both violate
    assert report["matches(email)"]["violations"] == 2
    assert not report["min_rows(10)"]["passed"]
    assert report["unique(k1, k2)"]["violations"] == 1  # one dup GROUP
    assert report["ref_integrity(k1 -> ref.k)"]["violations"] == 1
    assert all(r["checked"] == 4 for r in report.values())

    clean = spark.createDataFrame(
        [(1, 1, "a@x.io", 5.0, "A"), (2, 1, "b@x.io", 6.0, "B")],
        ["k1", "k2", "email", "score", "cat"],
    )
    ok = (
        ConstraintSuite()
        .not_null("email").in_range("score", 0.0, 10.0)
        .values_in("cat", ["A", "B"]).min_rows(2)
        .unique("k1", "k2").ref_integrity("k1", ref, "k")
        .run(clean)
    )
    assert all(r["passed"] for r in ok.collect())
