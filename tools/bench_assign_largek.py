"""Large-k A/B for the tiered centroid assignment (r11 verdict #3):
sweep k up to 4096 and measure the map-only expression tier vs the
broadcast-join tier on a replicated sf0.1 embeddings corpus.

The question the sweep answers: ASSIGN_EXPR_MAX_CENTROIDS=64 gates the
expression tier — is the join tier actually the right shape at the
100k-cluster SemDeDup scale, and where is the crossover?  Both tiers
do k dot products per row; the expression tier pays zero exchanges but
its plan grows linearly in k (codegen falls back to interpreted mode
past the JVM method limit), while the join tier pays one map-side-
combined shuffle at any k.  Reported per k: first-call time (includes
plan build/analysis — what an iterative Lloyd pass pays per iteration)
and steady-state min.

Usage: python tools/bench_assign_largek.py [--ks 64,256,1024,4096]
       [--replicas 50] [--reps 3] [--expr-budget 180]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="64,256,1024,4096")
    ap.add_argument("--replicas", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiers", default="expr,join",
                    help="comma subset of expr,join to run")
    ap.add_argument("--expr-budget", type=float, default=180.0,
                    help="skip the expression tier for larger k once a "
                         "first-call exceeds this many seconds")
    args = ap.parse_args()

    import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

    spark = get_spark("bench_assign_largek", shuffle_partitions=32)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n0 = emb.count()
    corpus = (
        emb.crossJoin(
            spark.range(args.replicas).select(F.col("id").alias("__r"))
        )
        .select(
            (F.col("vec_id") + F.col("__r") * (n0 + 1)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )
    n = corpus.count()

    def run(cents, crows) -> float:
        t0 = time.perf_counter()
        sim._assigned_frame(
            corpus.select("vec_id", "embedding"), cents, crows,
            vec_col="embedding",
        ).groupBy("centroid_id").count().collect()
        return time.perf_counter() - t0

    out = {"n_vectors": n, "replicas": args.replicas, "tiers": {}}
    expr_dead = False
    for k in [int(x) for x in args.ks.split(",")]:
        cents = sim.hash_centroids(corpus, k)
        crows = sim._cent_rows(cents)
        cell: dict = {}
        for tier, cap in (("expr", 1 << 20), ("join", 0)):
            if tier not in args.tiers.split(","):
                continue
            if tier == "expr" and expr_dead:
                cell[tier] = {"skipped": "budget exceeded at smaller k"}
                continue
            sim.ASSIGN_EXPR_MAX_CENTROIDS = cap
            times = []
            for _ in range(args.reps):
                times.append(round(run(cents, crows), 2))
                if tier == "expr" and times[0] > args.expr_budget:
                    expr_dead = True
                    break
            cell[tier] = {"first": times[0], "min": min(times), "all": times}
        out["tiers"][k] = cell
        print(f"k={k}: {json.dumps(cell)}", file=sys.stderr)
    sim.ASSIGN_EXPR_MAX_CENTROIDS = 64
    print(json.dumps(out))


if __name__ == "__main__":
    main()
