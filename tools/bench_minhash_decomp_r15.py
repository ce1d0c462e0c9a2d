"""dedup_minhash_pairs stage decomposition at sf0.1 (r15).

Times each stage of the md5-family minhash pipeline with the noop sink
in ONE warm session (min-of-N, interleaved), so the 2.7-3.0 s headline
cell can be attributed: explode+md5 scan, signature aggregate, banding
explode, the banded self-join, and the full query; plus a
localCheckpoint-the-banded-frame variant to see whether the duplicated
plan/codegen of the signature subtree (executed once via AQE reuse,
but planned/codegen'd twice) carries real cost.

Usage: python tools/bench_minhash_decomp_r15.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import _t
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.dedup import (
    banded_buckets,
    exploded_shingles,
    minhash_dedup_pairs,
    minhash_signatures,
)
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "minhash-decomp", shuffle_partitions=shuffle_partitions_for_dir(sf_dir)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = _t(spark, sf_dir, "documents")

    def shape_exploded():
        return exploded_shingles(docs, id_col="doc_id", text_col="text", n=3)

    def shape_sig():
        return minhash_signatures(
            docs, id_col="doc_id", text_col="text", num_hashes=64, n=3,
            hash_family="md5",
        )

    def shape_banded():
        return banded_buckets(shape_sig(), num_hashes=64, bands=16,
                              hash_family="md5")

    def shape_full():
        return minhash_dedup_pairs(
            docs, id_col="doc_id", text_col="text",
            num_hashes=64, bands=16, n=3, threshold=0.5, hash_family="md5",
        )

    def shape_full_ckpt():
        banded = banded_buckets(shape_sig(), num_hashes=64, bands=16,
                                hash_family="md5").localCheckpoint(eager=False)
        a = banded.alias("a")
        b = banded.alias("b").hint("shuffle_hash")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"),
                F.col("b.sig").alias("sig_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        est = (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    lambda v: v == 1,
                )
            )
            / F.lit(64.0)
        )
        return (
            cand.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b", "est_jaccard")
        )

    shapes = {
        "exploded_md5_scan": shape_exploded,
        "signature_agg": shape_sig,
        "banded_explode": shape_banded,
        "full_reuse": shape_full,
        "full_ckpt": shape_full_ckpt,
    }

    # plan-build (analysis+optimization+codegen prep) cost, one-shot
    build: dict[str, float] = {}
    for name, fn in shapes.items():
        t0 = time.perf_counter()
        df = fn()
        df._jdf.queryExecution().executedPlan()  # force planning (not execution)
        build[name] = round(time.perf_counter() - t0, 3)

    res: dict[str, float] = {}
    for r in range(reps):
        for name, fn in shapes.items():
            clear_persisted_blocks(spark, blocking=True)
            spark.sparkContext.setJobDescription(f"minhash-decomp {name} rep{r}")
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            res[name] = min(res.get(name, 1e9), dt)
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps,
        "min_sec": {k: round(v, 3) for k, v in res.items()},
        "plan_build_sec": build,
    }))


if __name__ == "__main__":
    main()
