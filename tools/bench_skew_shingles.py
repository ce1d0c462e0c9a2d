"""Skew A/B for the dedup shingle self-join (r11 verdict #4): one hot
phrase in 30% of a synthetic corpus, jaccard_similar_pairs with and
without the max_doc_freq hot-shingle cap.

Reports, per variant: wall time (min-of-N interleaved), the candidate
row count the shingle self-join emits (the d^2 term the cap bounds),
and the task-duration quantiles of the heaviest stage from Spark's
status REST API — the direct task-time-spread evidence (max/median
collapses once the hot keys are dropped; without the cap the hot
shingle's partitions dominate the stage).

Usage: python tools/bench_skew_shingles.py [--docs 20000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F  # noqa: E402


def task_time_spread(spark, seen: set | None = None) -> dict:
    """Max/median task duration of the heaviest completed stage via
    the UI REST API (local mode serves it when spark.ui.enabled).
    ``seen``: stage ids to exclude (so each variant reports only its
    own stages); the returned dict includes the updated id set."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return {}
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete")
        )
        all_ids = {s["stageId"] for s in stages}
        if seen is not None:
            stages = [s for s in stages if s["stageId"] not in seen]
            seen |= all_ids
        if not stages:
            return {"error": "no new stages"}
        heavy = max(stages, key=lambda s: s.get("executorRunTime", 0))
        q = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages/{heavy['stageId']}/"
                f"{heavy['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        )
        med, mx = q["executorRunTime"]
        return {
            "stage_id": heavy["stageId"],
            "task_ms_median": med,
            "task_ms_max": mx,
            "spread": round(mx / med, 1) if med else None,
        }
    except Exception as e:  # REST shape drift must not kill the bench
        return {"error": str(e)[:120]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cap", type=int, default=200)
    args = ap.parse_args()

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import dedup
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

    os.environ.setdefault("SPARK_UI_ENABLED", "true")
    spark = get_spark("skew-shingles", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    # synthetic Zipf-ish corpus: unique-ish bodies + one hot phrase in
    # 30% of docs (the boilerplate-footer pattern)
    n = args.docs
    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                # 14 pseudo-random body tokens from a 30k vocab
                *[
                    F.concat(F.lit("t"), (F.xxhash64("id", F.lit(i)) % 30000))
                    for i in range(14)
                ],
                F.when(F.col("id") % 3 == 0, F.lit("terms of service apply here"))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
        .persist()
    )
    corpus.count()

    def run(cap):
        out = dedup.jaccard_similar_pairs(
            corpus, id_col="doc_id", text_col="text", threshold=0.8,
            max_doc_freq=cap,
        )
        t0 = time.perf_counter()
        out.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    results = {}
    spreads = {}
    seen: set = set()
    task_time_spread(spark, seen)  # absorb warmup/persist stages
    for variant, cap in (("capped", args.cap), ("uncapped", None)):
        for _ in range(args.reps):
            dt = run(cap)
            results.setdefault(variant, []).append(round(dt, 2))
        spreads[variant] = task_time_spread(spark, seen)

    # candidate-row counts: the d^2 term itself
    idx = (
        dedup.exploded_shingle_hashes(corpus, id_col="doc_id", text_col="text", n=3)
        .distinct()
        .groupBy("shingle")
        .count()
    )
    def cand(capped):
        f = idx.filter(F.col("count") <= args.cap) if capped else idx
        return f.select(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
        ).first()["c"]

    summary = {
        "docs": n,
        "hot_frac": 0.333,
        "cap": args.cap,
        "wall_sec": {k: {"min": min(v), "all": v} for k, v in results.items()},
        "candidate_pairs": {"capped": int(cand(True)), "uncapped": int(cand(False))},
        "task_spread_heaviest_stage": spreads,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
