import sys, time, os
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))
from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import _book
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.orderbook import depth_series
from algorithmic_data_ingestion_for_cryptocurrencies_spark import session as S

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_scaled/sf1"
n = S.shuffle_partitions_for_dir(sf_dir)
spark = S.get_spark("ab-depth-w2", shuffle_partitions=n)
spark.sparkContext.setLogLevel("ERROR")
print(f"{sf_dir} shuffle_partitions={n}")
kw = dict(keys=["symbol"], tiebreak_cols=["okey", "lnum", "amount"])
book = _book(spark, sf_dir)
book.count()  # warm scan

def run(strategy):
    S.clear_persisted_blocks(spark, blocking=True)
    df = depth_series(book, 3, strategy=strategy, **kw)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0

variants = ["window", "window2", "prune", "window_ctl"]
times = {v: [] for v in variants}
REPS = int(os.environ.get("REPS", "5"))
for rep in range(REPS):
    order = variants if rep % 2 == 0 else variants[::-1]
    for v in order:
        strat = "window" if v == "window_ctl" else v
        times[v].append(run(strat))
for v in variants:
    ts = times[v]
    print(f"{v:11s} min={min(ts):.3f} all={[round(t,3) for t in ts]}")
