"""Observability surface: Prometheus exposition rendering, scheduler
export, and the Spark StreamingQueryListener bridge driving metrics
from REAL micro-batches."""

from __future__ import annotations

import time

import pytest


def test_exposition_format_counter_gauge_histogram(tmp_path):
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.metrics import (
        MetricsRegistry,
    )

    reg = MetricsRegistry()
    c = reg.counter("ingest_requests_total", "Requests.", ("domain", "status"))
    g = reg.gauge("queue_depth", "Depth.")
    h = reg.histogram("op_latency_seconds", "Latency.", ("op",), buckets=(0.1, 1.0))

    c.inc({"domain": "market", "status": "ok"})
    c.inc({"domain": "market", "status": "ok"}, 2)
    c.inc({"domain": 'we"ird\n', "status": "error"})
    g.set(7)
    h.observe(0.05, {"op": "write"})
    h.observe(0.5, {"op": "write"})
    h.observe(99.0, {"op": "write"})

    text = reg.render()
    assert '# TYPE ingest_requests_total counter' in text
    assert 'ingest_requests_total{domain="market",status="ok"} 3' in text
    assert r'domain="we\"ird\n"' in text
    assert "queue_depth 7" in text
    # cumulative buckets + +Inf + sum/count
    assert 'op_latency_seconds_bucket{op="write",le="0.1"} 1' in text
    assert 'op_latency_seconds_bucket{op="write",le="1"} 2' in text
    assert 'op_latency_seconds_bucket{op="write",le="+Inf"} 3' in text
    assert 'op_latency_seconds_count{op="write"} 3' in text

    with pytest.raises(ValueError):
        c.inc({"domain": "x"})  # missing label
    with pytest.raises(ValueError):
        c.inc({"domain": "x", "status": "ok"}, -1)  # counters go up

    # atomic textfile export round-trips the scrape payload
    p = tmp_path / "engine.prom"
    reg.write_textfile(str(p))
    assert p.read_text() == text


def test_scheduler_metrics_export():
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.metrics import (
        MetricsRegistry,
        export_job_metrics,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.scheduler import (
        JobScheduler,
    )

    t = [0.0]
    sched = JobScheduler(clock=lambda: t[0])

    def ok():
        t[0] += 0.25

    def boom():
        t[0] += 0.1
        raise RuntimeError("nope")

    sched.add_job("good", ok, interval_seconds=1.0, run_on_start=True)
    sched.add_job("bad", boom, interval_seconds=1.0, run_on_start=True)
    sched.run_pending()
    t[0] += 1.0
    sched.run_pending()

    reg = MetricsRegistry()
    export_job_metrics(sched, reg)
    text = reg.render()
    assert 'scheduler_job_runs_total{job="good",status="ok"} 2' in text
    assert 'scheduler_job_runs_total{job="bad",status="error"} 2' in text
    assert 'scheduler_job_duration_seconds{job="good",stat="last"} 0.25' in text


def test_streaming_listener_records_real_microbatches(spark, tmp_path):
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.metrics import (
        MetricsRegistry,
        MicroBatchMetricsListener,
    )

    reg = MetricsRegistry()
    listener = MicroBatchMetricsListener(reg)
    spark.streams.addListener(listener)
    try:
        src = tmp_path / "src"
        for i in range(2):
            spark.range(100).withColumn("v", F.col("id") * i).coalesce(1) \
                .write.mode("overwrite").parquet(str(src / f"f{i}"))
        stream = (
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            stream.writeStream.format("noop")
            .queryName("metrics_smoke")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered async; poll briefly
        deadline = time.time() + 30
        while time.time() < deadline:
            text = reg.render()
            if 'stream_input_rows_total{query="metrics_smoke"} 200' in text:
                break
            time.sleep(0.5)
        text = reg.render()
        assert 'stream_input_rows_total{query="metrics_smoke"} 200' in text
        assert 'stream_batch_duration_seconds_count{query="metrics_smoke"}' in text
    finally:
        spark.streams.removeListener(listener)


def test_dashboards_and_alerts_reference_only_exported_metrics(spark, tmp_path):
    """r7 (verdict #5): every metric name referenced by the Grafana
    dashboards under monitoring/grafana/ and by the Prometheus alert
    rules must exist in a REAL rendered exposition with all three
    exporters active (stream listener, scheduler export, feature-store
    instrumentation) — dashboards that query phantom metrics are
    decoration, not observability."""
    import json
    import os
    import re

    import pandas as pd

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.store.feature_store import (
        FeatureStore,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.metrics import (
        MetricsRegistry,
        MicroBatchMetricsListener,
        export_job_metrics,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.scheduler import (
        JobScheduler,
    )

    reg = MetricsRegistry()
    # stream listener metrics register at construction
    MicroBatchMetricsListener(reg)
    sched = JobScheduler(clock=lambda: 0.0)
    sched.add_job("noop", lambda: None, interval_seconds=1.0, run_on_start=True)
    sched.run_pending()
    export_job_metrics(sched, reg)
    fs = FeatureStore(spark, str(tmp_path / "fs"), metrics_registry=reg)
    pdf = pd.DataFrame({
        "timestamp": pd.to_datetime(["2024-01-01"]),
        "symbol": ["BTC/USDT"], "timeframe": ["1m"], "f": [1.0],
    })
    fs.write(spark.createDataFrame(pdf), domain="market")
    fs.read("market", "BTC/USDT", "1m", 0)
    fs.batch_read("market", "BTC/USDT", "1m", [0])
    fs.range_read("market", "BTC/USDT", "1m", 0, 10)
    text = reg.render()
    exported = set(re.findall(r"^([a-zA-Z_:][a-zA-Z0-9_:]*)\{?", text, re.M))
    exported |= set(re.findall(r"^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*)", text, re.M))
    exported |= {
        re.sub(r"_(bucket|sum|count)$", "", m) for m in exported
    }

    root = os.path.join(os.path.dirname(__file__), "..", "monitoring")
    exprs = []
    dash_dir = os.path.join(root, "grafana", "dashboards")
    assert sorted(os.listdir(dash_dir)) == [
        "feature_store.json", "ingestion-overview.json",
        "scheduler-overview.json",
    ]
    for f in os.listdir(dash_dir):
        d = json.load(open(os.path.join(dash_dir, f)))
        for p in d.get("panels", []):
            exprs += [t["expr"] for t in p.get("targets", []) if "expr" in t]
        for v in d.get("templating", {}).get("list", []):
            q = v.get("query")
            if isinstance(q, str):
                exprs.append(q)
    with open(os.path.join(root, "alert_rules.yml")) as f:
        exprs += re.findall(r"expr:\s*(.+?)(?=\n\s+(?:for|labels):)",
                            f.read(), re.S)

    promql_fns = {
        "sum", "rate", "increase", "histogram_quantile", "clamp_min",
        "topk", "label_values", "by", "le", "time", "max", "min", "avg",
    }
    checked = set()
    for expr in exprs:
        for name in re.findall(r"[a-zA-Z_:][a-zA-Z0-9_:]*", expr):
            if name in promql_fns or name.startswith("__") or len(name) < 8:
                continue
            if not re.search(r"_(total|seconds|queries|bucket|sum|count)$", name):
                continue
            base = re.sub(r"_(bucket|sum|count)$", "", name)
            assert base in exported or name in exported, (
                f"dashboard/alert references unexported metric {name!r}"
            )
            checked.add(base)
    # the sweep actually bound the full exporter surface
    assert {
        "stream_input_rows_total", "stream_batch_duration_seconds",
        "scheduler_job_runs_total", "scheduler_job_duration_seconds",
        "feature_writes_total", "feature_reads_total",
        "feature_op_latency_seconds",
    } <= checked


def test_state_metrics_assert_bounded_dedup_state(spark, tmp_path):
    """r14 (verdict #6): the r13 ST2 unbounded-state bug class —
    dedup state that only ever grows — must be visible in METRICS,
    not only by hand-reading recentProgress.  Drives the
    dropDuplicatesWithinWatermark path over 5 micro-batches whose
    event time advances 1 hour per batch (watermark 10 minutes, so
    every batch's state is evictable by the batch after next) and
    asserts from the exported registry that (a) evictions happened
    (stream_state_rows_removed_total > 0) and (b) the final state
    size is bounded by the two most recent batches, far below the
    15 distinct ids ingested — the exact signal that stayed flat /
    grew monotonically under the buggy dropDuplicates shape."""
    import os
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.dedup_stream import (
        dedup_stream,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.metrics import (
        MetricsRegistry,
        MicroBatchMetricsListener,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    src = tmp_path / "src"
    os.makedirs(src)
    for i in range(5):
        pdf = pd.DataFrame({
            "id": [f"b{i}_{j}" for j in range(3)],
            "ts": pd.Series([base + pd.Timedelta(hours=i)] * 3)
            .astype("datetime64[us]"),
        })
        path = str(src / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_700_000_000 + i * 10,) * 2)

    reg = MetricsRegistry()
    listener = MicroBatchMetricsListener(reg)
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema("id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        out = dedup_stream(stream, id_col="id", ts_col="ts",
                           watermark="10 minutes")
        q = (
            out.writeStream.format("noop")
            .queryName("state_bound")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        def scrape():
            text = reg.render()
            gauge = re.findall(
                r'^stream_state_rows\{[^}]*query="state_bound"[^}]*\} (\S+)$',
                text, re.M,
            )
            removed = re.findall(
                r'^stream_state_rows_removed_total\{[^}]*query="state_bound"'
                r'[^}]*\} (\S+)$', text, re.M,
            )
            return gauge, removed

        deadline = time.time() + 30  # listener events are async
        while time.time() < deadline:
            gauge, removed = scrape()
            if gauge and removed and float(removed[-1]) > 0:
                break
            time.sleep(0.5)
        gauge, removed = scrape()
        assert gauge, "state gauge never exported"
        assert removed and float(removed[-1]) > 0, \
            "no evictions observed — the ST2 unbounded-state signature"
        final_state = float(gauge[-1])
        assert final_state <= 6.0, final_state   # two most recent batches
        assert final_state < 15.0                # << all distinct ids
    finally:
        spark.streams.removeListener(listener)
