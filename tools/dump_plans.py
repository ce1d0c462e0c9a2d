"""Regenerate PLANS.md: formatted physical plans for representative
queries with commentary on the 100 TB property each demonstrates."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SECTIONS = {
    "flagship_market_features": (
        "One scan; ALL rolling/window expressions share a single sort per window "
        "spec (fused EWM block structure keeps the MACD family in the same "
        "partitioning); no cartesian products; scan reads only the projected "
        "columns."
    ),
    "w04_rolling_mean": (
        "Minimal window query: parquet scan with pruned ReadSchema -> one "
        "exchange on the series key -> one WindowExec computing mask count and "
        "mean in the same frame."
    ),
    "j1_equi_join": (
        "Dimension join: customer broadcast (BroadcastHashJoin), orders never "
        "shuffles."
    ),
    "a6_global_zscore": (
        "Global standardization WITHOUT a global window: two-pass agg + "
        "broadcast join (a Window.partitionBy() with no keys would serialize "
        "the table through one task)."
    ),
    "dedup_jaccard_pairs": (
        "Inverted-index self-join: shingle exchange is built once and reused "
        "(ReusedExchange) for both join sides; set sizes ride along as a window "
        "count, so no extra scan or per-document broadcast."
    ),
    "j5_range_join": (
        "Non-equi point-in-interval join rewritten as a bucketed EQUI join: "
        "the plan is a hash equi join on the bucket key (broadcast at this "
        "SF; a shuffle SMJ when both sides are large, AQE-splittable) with "
        "the exact range predicate as the join's post-condition — no "
        "CartesianProduct and no per-pair BroadcastNestedLoopJoin, which is "
        "what the naive range predicate would plan as."
    ),
    "samp_bernoulli_strata": (
        "Hash-Bernoulli sampling is a pure narrow filter: zero exchanges, the "
        "md5-threshold predicate sits directly over the scan — sampling 100 TB "
        "costs exactly one read."
    ),
    "dedup_contamination": (
        "Train/eval shingle containment: distinct train shingles aggregate "
        "map-side, the eval side joins on the shingle key as a standard "
        "shuffle join (AQE-splittable under hot shingles), and the per-doc "
        "score aggregates on the doc id that rode the explode projection."
    ),
    "a4_depth": (
        "Exchange-FIRST object aggregation (r4): collect-style partials "
        "reduce nothing, so the one shuffle is an explicit repartition on "
        "the group keys that the aggregate reuses — the CPU-heavy "
        "sort_array/collect_list work runs at full reduce parallelism "
        "instead of on however few splits the scan produced."
    ),
    "training_matrix": (
        "Single-exchange spine (r4): resample(pre_cluster=symbol) "
        "hash-partitions the raw bars once on a SUBSET of the aggregate's "
        "group keys; that one exchange satisfies the resample groupBy AND "
        "every downstream window stage. Social/news rollups broadcast onto "
        "the spine; labels ride the last window cluster's ordering through "
        "the broadcast joins (no extra sort)."
    ),
    "text_chunking": (
        "Context-window chunking as projection + explode: ZERO exchanges — "
        "chunking a 100 TB corpus costs exactly one read."
    ),
    "text_repetition": (
        "Within-doc duplicate-ngram ratio entirely in array expressions: "
        "no explode, no shuffle, whole-stage codegen end to end."
    ),
    "samp_token_budget": (
        "Global running sum WITHOUT a single-partition window over the data: "
        "RangePartitioning exchange on the order key, per-partition prefix "
        "sums windowed by the physical partition id, and the only "
        "unpartitioned window runs over the BOUNDED per-partition totals "
        "(rows = #partitions) that broadcast back — the data-sized stages "
        "all run at full parallelism."
    ),
    "samp_split_groups": (
        "Group-aware split assignment is a pure narrow projection: zero "
        "exchanges, seeded-md5 CASE ranges directly over the scan."
    ),
    "st11_rollup_incremental": (
        "Continuous-aggregate read: the state-table scan merges per-batch "
        "partial states with ONE hash aggregate (map-side combined); "
        "incremental maintenance appended bucket-grain rows, never "
        "rewriting history."
    ),
    "dedup_cluster_survivors": (
        "Pairs -> connected components -> survivors: the iterative CC "
        "rounds run on the PAIR graph (tiny vs the corpus, lineage "
        "truncated per round); the corpus-sized work is one LEFT equi-join "
        "against the labeling plus a bucket-grain size aggregate — nothing "
        "quadratic, nothing driver-side."
    ),
}


def main() -> None:
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import REGISTRY
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.plans.inspect import explain_str
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

    spark = get_spark("plandump")
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    out = [
        "# PLANS — physical-plan evidence for the scale design",
        "",
        "Generated by `tools/dump_plans.py` (Spark `explain('formatted')` at sf0.01).",
        "Each plan demonstrates a specific 100 TB property; see commentary per query.",
        "",
    ]
    for name, why in SECTIONS.items():
        fn, _sql = REGISTRY[name]
        plan = explain_str(fn(spark, sf), "formatted")
        head = plan.split("\n\n")[0]
        out.append(f"## {name}\n\n{why}\n\n```\n{head}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
