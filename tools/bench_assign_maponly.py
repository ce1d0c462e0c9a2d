"""A/B for PLANS.md rule X: map-only expression assignment vs the
broadcast-join shape, on a replicated embeddings corpus.

Builds an n-replica corpus from sf0.1 embeddings (key-shifted ids,
the make_scaled_sf.py convention), then times the corpus-list
assignment stage of an IVF build — the exact stage rule X moved off
the shuffle — under both tiers by flipping
``similarity.ASSIGN_EXPR_MAX_CENTROIDS``. Interleaved A/B/A/B,
min-of-N reported, plus a same-shape control (plain projection +
count) to expose host drift.

Usage: python tools/bench_assign_maponly.py [--replicas 100] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n-centroids", type=int, default=16)
    args = ap.parse_args()

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
        get_spark,
    )
    import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim

    spark = get_spark("bench_assign", shuffle_partitions=32)
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
        .localCheckpoint(eager=True)  # freeze the input; time ONLY assignment
    )
    n = corpus.count()
    cents = sim.hash_centroids(corpus, args.n_centroids)
    crows = sim._cent_rows(cents)

    def run() -> float:
        t0 = time.time()
        sim._assigned_frame(
            corpus.select("vec_id", "embedding"), cents, crows,
            vec_col="embedding",
        ).groupBy("centroid_id").count().collect()
        return time.time() - t0

    def control() -> float:
        t0 = time.time()
        corpus.select("vec_id", "embedding").groupBy(
            (F.col("vec_id") % args.n_centroids).alias("b")
        ).count().collect()
        return time.time() - t0

    expr_t, join_t, ctrl_t = [], [], []
    for _ in range(args.reps):
        sim.ASSIGN_EXPR_MAX_CENTROIDS = 1 << 20
        expr_t.append(run())
        sim.ASSIGN_EXPR_MAX_CENTROIDS = 0
        join_t.append(run())
        ctrl_t.append(control())
    sim.ASSIGN_EXPR_MAX_CENTROIDS = 64
    print(
        f"n={n} k={args.n_centroids} reps={args.reps} | "
        f"expr tier min={min(expr_t):.2f}s | "
        f"join tier min={min(join_t):.2f}s | "
        f"control min={min(ctrl_t):.2f}s"
    )


if __name__ == "__main__":
    main()
