"""SQL registration layer (SURVEY §7.1, closed r8): every capability
reachable from plain ``spark.sql`` over registered views, value-equal
to the DataFrame API path."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_register_views_registers_tables_and_domain(spark):
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.sql import register_views

    names = register_views(spark, SF_DIR)
    for t in ("lineitem", "orders", "customer", "documents",
              "embeddings", "market", "book"):
        assert t in names
    # views are live logical plans: filters still push to the scan
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str

    df = spark.sql(
        "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45"
    )
    plan = explain_str(df, "formatted")
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    assert df.count() > 0

    with pytest.raises(FileNotFoundError):
        register_views(spark, "/nonexistent-dir", strict=True)
    assert register_views(spark, "/nonexistent-dir") == []


def _twin_sources():
    """Every registered sql_* twin, derived from the registry so new
    twins are covered automatically (r10: 61 twins across the window,
    indicator, join, set-op, sampling, text and streaming families)."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY

    return sorted(n[4:] for n in REGISTRY if n.startswith("sql_"))


@pytest.mark.parametrize("src", _twin_sources())
def test_sql_twin_equals_dataframe_api(spark, src):
    """The sql_* twin executes the oracle SQL text verbatim through
    spark.sql; rows must equal the DataFrame-API query exactly."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY

    df_api = REGISTRY[src][0](spark, SF_DIR)
    sql_api = REGISTRY[f"sql_{src}"][0](spark, SF_DIR)
    assert df_api.columns == sql_api.columns
    assert sql_api.exceptAll(df_api).count() == 0
    assert df_api.exceptAll(sql_api).count() == 0
