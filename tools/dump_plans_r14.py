"""Dump .explain("formatted") for the optimization round's queries into
plans/r14/<query>_<tag>.txt (tag = before|after).

Usage: python tools/dump_plans_r14.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY
from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

DEFAULT = [
    "j5_range_join",
    "sim_near_pairs_capped",
    "g1_pagerank",
    "training_matrix",
    "flagship_market_features",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "j3_asof_join",
    "u6_backtest",
    "dedup_substring_scrub",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r14")
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df, "formatted"))
        print("wrote", path)


if __name__ == "__main__":
    main()
