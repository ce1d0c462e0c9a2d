"""Plan-shape A/B for dedup_cross_doc_repetition (r12, verdict task
#5 fallout): BENCH_FLOOR_r12 shows the query runs 3.3-4.3x its
bare_doc_explode_agg floor across tiers, so the task's "one plan
attempt with the A/B recorded" clause applies. Two physical shapes
for the same doc-frequency semantics:

- join  (shipped): distinct (id, shingle) -> groupBy(shingle) freq ->
  equi-join back -> per-doc agg. 4 exchanges, all hash.
- window (candidate): distinct (id, shingle) ->
  COUNT(*) OVER (PARTITION BY shingle) -> per-doc agg. Replaces the
  freq agg + join with ONE exchange on shingle + a per-partition sort
  (WindowExec needs its partition clustered AND sorted).

Interleaved round-robin min-of-N (the r10 ordering lesson), values
asserted identical before timing.

Usage: python tools/bench_crossdoc_shapes.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.dedup import (
    cross_doc_repetition,
    exploded_shingle_hashes,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)


def window_shape(df, *, id_col: str, text_col: str, n: int = 3, min_docs: int = 2):
    """COUNT OVER (PARTITION BY shingle) variant of
    cross_doc_repetition — identical output, one fewer exchange."""
    sh = exploded_shingle_hashes(df, id_col=id_col, text_col=text_col, n=n).distinct()
    return (
        sh.withColumn("__dfc", F.count("*").over(Window.partitionBy("shingle")))
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("__dfc") >= min_docs, 1)).alias("n_repeated"),
        )
        .withColumn("repeated_frac", F.col("n_repeated") / F.col("n_shingles"))
    )


def main() -> None:
    tiers = sys.argv[1:] or ["testdata_scaled/sf1", "testdata_scaled/sf3"]
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark("ab-crossdoc")
    spark.sparkContext.setLogLevel("ERROR")
    noop = lambda df: df.write.mode("overwrite").format("noop").save()
    out: dict = {"metric": "crossdoc_shape_ab", "unit": "sec",
                 "reps_min_of": reps, "tiers": {}}
    for sf_dir in tiers:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions_for_dir(sf_dir))
        )
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        shapes = {
            "join": lambda: cross_doc_repetition(
                docs, id_col="doc_id", text_col="text", n=3, min_docs=2
            ),
            "window": lambda: window_shape(
                docs, id_col="doc_id", text_col="text", n=3, min_docs=2
            ),
        }
        # value identity BEFORE timing: an A/B between non-equal plans
        # measures nothing
        a = {tuple(r) for r in shapes["join"]().collect()}
        b = {tuple(r) for r in shapes["window"]().collect()}
        assert a == b, f"{sf_dir}: shapes disagree ({len(a ^ b)} rows differ)"

        best = {k: None for k in shapes}
        for rep in range(reps):
            order = list(shapes) if rep % 2 == 0 else list(reversed(shapes))
            for k in order:
                clear_persisted_blocks(spark, blocking=True)
                t0 = time.perf_counter()
                noop(shapes[k]())
                dt = time.perf_counter() - t0
                best[k] = dt if best[k] is None else min(best[k], dt)
        out["tiers"][sf_dir] = {k: round(v, 3) for k, v in best.items()}
        print(sf_dir, out["tiers"][sf_dir], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
