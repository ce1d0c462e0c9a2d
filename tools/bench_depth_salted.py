"""A/B the a4_depth physical tiers (window / prune / salted) at the
scaled tiers, interleaved min-of-N with a block sweep before every
timed run. Usage: python tools/bench_depth_salted.py SF_DIR [SF_DIR..]
Env: DEPTH_REPS (default 5).
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import _book
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.orderbook import (
    depth_series,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)

REPS = int(os.environ.get("DEPTH_REPS", "5"))
KW = dict(keys=["symbol"], tiebreak_cols=["okey", "lnum", "amount"])
TIERS = ("window", "prune", "salted")


def run(spark, df):
    clear_persisted_blocks(spark, blocking=True)
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


results = {}
for sf_dir in sys.argv[1:]:
    nsp = shuffle_partitions_for_dir(sf_dir)
    spark = get_spark("depth-ab", shuffle_partitions=nsp)
    spark.sparkContext.setLogLevel("ERROR")
    book = _book(spark, sf_dir)
    book.count()  # warm the scan
    best = {t: None for t in TIERS}
    for rep in range(REPS):  # interleave: one rep of each tier per pass
        for t in TIERS:
            dt = run(spark, depth_series(book, 3, strategy=t, **KW))
            best[t] = dt if best[t] is None else min(best[t], dt)
    results[sf_dir] = {t: round(v, 3) for t, v in best.items()}
    print(json.dumps({sf_dir: results[sf_dir], "parts": nsp}), flush=True)
print(json.dumps(results))
