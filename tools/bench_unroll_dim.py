"""Measure the unrolled-vs-HOF crossover for dot/norm/cosine by dim.

Round-4 verdict: the unrolled element_at chain at dim=64 is 3-5x SLOWER
than the HOF (zip_with/aggregate) tier in a join-stage context — the
generated method blows past JIT inlining limits. This probe measures
both tiers at several dims on a pairwise-scoring workload shaped like
sim_near_pairs, so UNROLL_MAX_DIM in operators/similarity.py is a
measured constant, not a guess.

Run: python tools/bench_unroll_dim.py
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import similarity as sim

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("unroll-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N = 700  # ~245k pairs per run


def run(dim_data, dim_arg):
    df = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim_data)),
            lambda i: (F.pmod(F.col("id") * i, F.lit(97)) / 97.0).cast("float"),
        ).alias("embedding"),
    )
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        (sim.dot("va", "vb", dim=dim_arg)
         / F.nullif(sim.norm("va", dim=dim_arg) * sim.norm("vb", dim=dim_arg), F.lit(0.0))
         ).alias("cos")
    ).filter(F.col("cos") > 0.99)
    t = []
    for _ in range(3):
        t0 = time.time()
        scored.count()
        t.append(time.time() - t0)
    return min(t)


print(f"{'dim':>4} {'hof_s':>8} {'unroll_s':>9} {'ratio(unroll/hof)':>18}")
for d in (4, 8, 16, 24, 32, 64):
    hof = run(d, None)
    unr = run(d, d)
    print(f"{d:>4} {hof:>8.2f} {unr:>9.2f} {unr / hof:>18.2f}")
spark.stop()
