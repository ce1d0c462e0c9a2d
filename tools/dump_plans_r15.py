"""Dump .explain("formatted") for the round-15 optimization queries
into plans/r15/<query>_<tag>.txt (tag = before|after|...).

``--exec`` executes each query (noop sink) BEFORE dumping, so the
dumped plan is the AQE FINAL plan (isFinalPlan=true) — the committed
evidence the r14 verdict asked for on the dedup self-join
exchange-reuse claim, which static plans cannot show (AQE stage reuse
happens at runtime; the initial plan prints the subtree on both join
sides even when only one will be built).

Usage: python tools/dump_plans_r15.py <tag> [--exec] [query ...]
       SPARK_GRAFT_SF_DIR=... python tools/dump_plans_r15.py after --exec
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY
from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

DEFAULT = [
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_simhash_pairs",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    args = sys.argv[2:]
    execute = "--exec" in args
    names = [a for a in args if not a.startswith("--")] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "dump-plans-r15", shuffle_partitions=shuffle_partitions_for_dir(sf_dir)
    )
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        if execute:
            clear_persisted_blocks(spark, blocking=True)
            spark.sparkContext.setJobDescription(f"dump_plans_r15: {name}")
            # execute THROUGH the DataFrame's own QueryExecution (a
            # .write would plan a NEW QueryExecution and leave this
            # one un-executed/isFinalPlan=false); results of the
            # queries dumped this way are small by contract
            n = len(df.collect())
            print(f"{name}: executed, {n} rows")
            spark.sparkContext.setJobDescription(None)
        text = explain_str(df, "formatted")
        suffix = f"{tag}_executed" if execute else tag
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({'executed/AQE-final' if execute else 'static'})\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
