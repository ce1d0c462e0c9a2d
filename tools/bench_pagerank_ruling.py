"""g1_pagerank sf30 controlled re-measure (r14 verdict task #3).

The r13 campaign's sf30 cells ran 1.7-1.9x hotter than r12 in BOTH of
its windows on identical plans (92.8 s vs ~50 s), disclosed as
suspected host memory state but unresolved.  This tool makes the
ruling measurable in ONE process and ONE window:

- min-of-N g1_pagerank at sf10 then sf30 (window 1), a buffer rep at
  sf10, then a second sf30 window (min-of-2) — the standard
  second-window policy applied to the ambiguous tier;
- one additional traced sf30 run with the Spark UI enabled, scraping
  the REST API for the top stages by peakExecutionMemory and the
  executor memory summary, so "the allocation" has a name if the hot
  cell is real;
- the sf30/sf10 scaling factor against the ≤(1.3 x 3) healthy bound
  from the verdict's done-criterion.

Usage: python tools/bench_pagerank_ruling.py [sf10_dir sf30_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algorithmic_data_ingestion_for_cryptocurrencies_spark import driver_queries as dq
from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import (
    clear_persisted_blocks,
    get_spark,
    shuffle_partitions_for_dir,
)


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "testdata_scaled/sf10"
    sf30 = sys.argv[2] if len(sys.argv) > 2 else "testdata_scaled/sf30"
    reps = int(os.environ.get("REPS", "3"))
    spark = get_spark(
        "pagerank-ruling", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn, _sql = dq.REGISTRY["g1_pagerank"]

    def timed(sf_dir: str, n: int) -> list[float]:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions_for_dir(sf_dir))
        )
        out = []
        for _ in range(n):
            clear_persisted_blocks(spark, blocking=True)
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir))
            out.append(round(time.perf_counter() - t0, 3))
            print(f"  {sf_dir}: {out[-1]}s", flush=True)
        return out

    _noop(fn(spark, "/root/testdata/sf0.01"))  # warm the plan
    # one UNTIMED sf10 run: the first large-tier execution carries
    # ~15 s of JIT/C2 compilation across the ~100-stage iteration
    # (measured: 31-37 s cold vs 17.6 s warm in the same session) —
    # the window should measure steady state, as the campaign does
    # after its 30 preceding queries
    timed(sf10, 1)

    res: dict = {"metric": "pagerank_sf30_ruling", "unit": "sec",
                 "reps": reps,
                 "protocol": "warm(sf0.01+sf10) w1(sf10,sf30) buffer w2(sf30) trace(sf30)"}
    res["sf10_w1"] = timed(sf10, reps)
    res["sf30_w1"] = timed(sf30, reps)
    res["sf10_buffer"] = timed(sf10, 1)
    res["sf30_w2"] = timed(sf30, 2)

    # traced run: scrape per-stage peak execution memory + executor mem
    clear_persisted_blocks(spark, blocking=True)
    t0 = time.perf_counter()
    _noop(fn(spark, sf30))
    res["sf30_traced"] = round(time.perf_counter() - t0, 3)
    try:
        app = _rest("/applications")[0]["id"]
        stages = _rest(f"/applications/{app}/stages?status=COMPLETE")
        top = sorted(
            stages, key=lambda s: s.get("peakExecutionMemory", 0), reverse=True
        )[:10]
        res["top_stages_by_peak_exec_mem"] = [
            {
                "stageId": s.get("stageId"),
                "peakExecutionMemory_mb": round(
                    s.get("peakExecutionMemory", 0) / 1e6, 1
                ),
                "shuffleWriteBytes_mb": round(
                    s.get("shuffleWriteBytes", 0) / 1e6, 1
                ),
                "name": (s.get("name") or "")[:90],
            }
            for s in top
        ]
        execs = _rest(f"/applications/{app}/executors")
        res["executors"] = [
            {
                "id": e.get("id"),
                "maxMemory_mb": round(e.get("maxMemory", 0) / 1e6, 1),
                "memoryUsed_mb": round(e.get("memoryUsed", 0) / 1e6, 1),
                "peakJVMHeap_mb": round(
                    (e.get("peakMemoryMetrics") or {}).get("JVMHeapMemory", 0)
                    / 1e6, 1,
                ),
            }
            for e in execs
        ]
    except Exception as e:  # the ruling survives a UI scrape failure
        res["trace_error"] = str(e)[:200]

    m10, m30 = min(res["sf10_w1"] + res["sf10_buffer"]), min(
        res["sf30_w1"] + res["sf30_w2"]
    )
    res["min_sf10"], res["min_sf30"] = m10, m30
    res["scaling_per_3x"] = round(m30 / m10 / 3.0, 3)
    res["healthy_bound_sec"] = round(1.3 * 3 * m10, 1)
    res["within_healthy_bound"] = m30 <= 1.3 * 3 * m10
    print(json.dumps(res))


if __name__ == "__main__":
    main()
