"""Approximate-aggregate accuracy. Spark-native sketches (HLL distinct
within 5%, KLL median within 1%) stay covered as the engine-wide fast
path; the PORTABLE sketches (KMV distinct + fixed-bin histogram
percentiles — the hash-exact `agg_approx` query since r11) carry
their own accuracy contracts here, since their DuckDB oracle proves
reproducibility, not closeness to the exact answer."""

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


def test_kmv_distinct_accuracy_and_exact_below_k(spark):
    """Portable KMV sketch (r11, the hash-exact agg_approx): estimate
    within 4/sqrt(k) of the exact distinct count above k, and EXACTLY
    the distinct count for groups with < k distinct keys."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.sketches import (
        kmv_distinct,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    k = 256
    est = {
        r["l_returnflag"]: r["approx"]
        for r in kmv_distinct(
            li, ["l_returnflag"], "l_orderkey", k=k, out="approx"
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for g, e in exact.items():
        assert abs(est[g] - e) / e < 4.0 / (k ** 0.5), (g, est[g], e)

    # below-k groups: the sketch IS the exact count
    small = li.filter(F.col("l_orderkey") < 200)  # < k distinct per group
    est_s = {
        r["l_returnflag"]: r["approx"]
        for r in kmv_distinct(
            small, ["l_returnflag"], "l_orderkey", k=k, out="approx"
        ).collect()
    }
    exact_s = {
        r["l_returnflag"]: r["exact"]
        for r in small.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact"))
        .collect()
    }
    assert est_s == {g: float(v) for g, v in exact_s.items()}


def test_hist_percentiles_within_one_bin(spark):
    """Fixed-bin histogram percentiles (r11): each estimate lands
    within one bin width of the exact percentile, and the p50/p95
    columns are ordered."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.sketches import (
        hist_percentiles,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    width = 110000.0 / 1100
    got = {
        r["l_returnflag"]: r
        for r in hist_percentiles(
            li, ["l_returnflag"], "l_extendedprice",
            lo=0.0, hi=110000.0, nbins=1100,
            ps={"p50": 0.5, "p95": 0.95},
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("e95"),
        )
        .collect()
    }
    for g, r in got.items():
        assert abs(r["p50"] - exact[g]["e50"]) <= width + 1e-9
        assert abs(r["p95"] - exact[g]["e95"]) <= width + 1e-9
        assert r["p50"] <= r["p95"]


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


def test_funnel_ordering_and_window(spark):
    """Steps must complete IN ORDER (a purchase before the click does
    not count), broken funnels stay broken downstream, and the
    within-seconds window cuts late completions."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.funnel import (
        funnel_steps,
    )

    rows = [
        # u1 completes in order: A@0 B@10 C@20
        ("u1", "A", 0), ("u1", "B", 10), ("u1", "C", 20),
        # u2: C BEFORE B -> funnel breaks at step 3
        ("u2", "A", 0), ("u2", "C", 5), ("u2", "B", 10),
        # u3: only A
        ("u3", "A", 0),
        # u4: never does A -> not in the funnel at all
        ("u4", "B", 0), ("u4", "C", 1),
        # u5: completes but slowly (C at 100)
        ("u5", "A", 0), ("u5", "B", 1), ("u5", "C", 100),
        # NULL user: would "complete" in one Window.partitionBy
        # partition, but the join-chain/SQL-equi-join semantics the
        # operator pins (r13 review) give it t_step_1 only
        (None, "A", 0), (None, "B", 10), (None, "C", 20),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "t"]).select(
        "user_id", "event_type", F.timestamp_seconds("t").alias("ts")
    )
    got = {
        r["user_id"]: r
        for r in funnel_steps(ev, ["A", "B", "C"]).collect()
    }
    assert set(got) == {"u1", "u2", "u3", "u5", None}
    assert got["u1"]["steps_completed"] == 3
    assert got["u2"]["steps_completed"] == 2 and got["u2"]["t_step_3"] is None
    assert got["u3"]["steps_completed"] == 1
    # NULL user: grouped (GROUP BY groups NULLs) but funnel broken at
    # step 1 (equi-join semantics never match a NULL key)
    assert got[None]["steps_completed"] == 1
    assert got[None]["t_step_2"] is None and got[None]["t_step_3"] is None

    win = {
        r["user_id"]: r
        for r in funnel_steps(ev, ["A", "B", "C"], within_seconds=50).collect()
    }
    assert win["u1"]["steps_completed"] == 3
    assert win["u5"]["steps_completed"] == 2  # C@100 outside the window


def test_cohort_retention_triangle(spark):
    """Offsets count distinct users against the cohort size; week-0
    retention is exactly 1.0."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.funnel import (
        cohort_retention,
    )

    week = 7 * 86400
    rows = [
        ("a", 0), ("a", week + 5), ("b", 10), ("c", week + 1),
        ("c", 2 * week + 1),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "t"]).select(
        "user_id", F.timestamp_seconds("t").alias("ts")
    )
    tri = {
        (r["cohort_period"], r["period_offset"]): r
        for r in cohort_retention(ev, period_seconds=week).collect()
    }
    # cohort week 0: a, b (size 2); week-1 active: a only
    assert tri[(0, 0)]["cohort_size"] == 2 and tri[(0, 0)]["retention"] == 1.0
    assert tri[(0, 1)]["n_active"] == 1 and tri[(0, 1)]["retention"] == 0.5
    # cohort week 1: c (size 1), retained at offset 1
    assert tri[(week, 1)]["retention"] == 1.0
