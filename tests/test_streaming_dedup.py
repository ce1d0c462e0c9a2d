"""ST2/ST6 streaming coverage: watermarked dedup (the RSS seen-ids
set) and tumbling event-time counts, driven through real file-source
micro-batches, plus S19/S20 storage helpers and the Covalent
normalizer (S6).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.adapters import (
    normalize_covalent,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.lake import (
    persist_raw,
    storage_probe,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.dedup_stream import (
    dedup_stream,
    windowed_counts,
)


def _write_batches(spark, src, frames):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i, pdf in enumerate(frames):
        pdf = pdf.copy()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        path = os.path.join(src, f"b{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (1_700_000_000 + i * 10,) * 2)
    return spark.read.parquet(os.path.join(src, "b0.parquet")).schema


def test_stream_dedup_across_batches(spark):
    base = pd.Timestamp("2024-01-01 00:00:00")
    b0 = pd.DataFrame(
        {"id": ["a", "b", "c"], "ts": [base + pd.Timedelta(minutes=i) for i in range(3)]}
    )
    # batch 1 repeats b and c (the RSS poll returning overlapping items)
    b1 = pd.DataFrame(
        {"id": ["b", "c", "d"], "ts": [base + pd.Timedelta(minutes=i) for i in (1, 2, 3)]}
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        schema = _write_batches(spark, src, [b0, b1])
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        out = dedup_stream(stream, id_col="id", ts_col="ts", watermark="1 hour")
        sink, ckpt = os.path.join(tmp, "sink"), os.path.join(tmp, "ckpt")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(sink).toPandas()
    assert sorted(got["id"]) == ["a", "b", "c", "d"]  # each id exactly once


def test_stream_windowed_counts(spark):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = pd.DataFrame(
        {
            "id": [f"e{i}" for i in range(8)],
            "ts": [base + pd.Timedelta(seconds=30 * i) for i in range(8)],
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        schema = _write_batches(spark, src, [rows])
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        out = windowed_counts(stream, ts_col="ts", every="1 minute", watermark="10 minutes")
        ckpt = os.path.join(tmp, "ckpt")
        # complete-mode memory sink: append mode would hold every window
        # open until the watermark passes it, which a single availableNow
        # batch never does
        q = (
            out.writeStream.format("memory")
            .queryName("win_counts")
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM win_counts").toPandas().sort_values("bucket")
    # 8 events at 30s spacing -> 4 full minutes x 2 events
    assert list(got["n"]) == [2, 2, 2, 2]


def test_storage_probe_and_persist_raw(spark):
    with tempfile.TemporaryDirectory() as tmp:
        assert storage_probe(spark, tmp) is True
        path = persist_raw(
            spark,
            '{"symbol": "BTC/USDT", "last": 101.5, "info": {"bid": "101.4", "ask": "101.6"}}',
            source="binance",
            symbol="BTC/USDT",
            base_path=tmp,
        )
        back = spark.read.parquet(path).collect()
    assert len(back) == 1
    row = back[0].asDict()
    assert row["last"] == 101.5
    assert row["info.bid"] == "101.4"  # json_normalize-style flattening
    assert row["__source"] == "binance"


def test_normalize_covalent_scaling(spark):
    df = normalize_covalent(
        spark,
        [
            {
                "contract_ticker_symbol": "USDC",
                "contract_address": "0xabc",
                "contract_name": "USD Coin",
                "balance": 12_500_000,
                "contract_decimals": 6,
            }
        ],
        symbol="0xwallet",
        snapshot_epoch_ms=1_700_000_000_000,
    )
    row = df.first()
    assert row["value"] == 12.5  # balance / 10**decimals
    assert row["metric"] == "USDC" and row["contract_name"] == "USD Coin"


def test_stream_stream_join_bounded_lag(spark, tmp_path):
    """Two real file streams joined with event-time bounds: only right
    events within [left_ts - 5 min, left_ts] match, and the batch
    result equals the same join run statically (streaming == batch)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.joins import (
        stream_stream_join,
    )

    base = pd.Timestamp("2024-06-01 12:00:00")
    trades = pd.DataFrame({
        "sym": ["BTC", "BTC", "ETH", "BTC"],
        "ts": [base, base + pd.Timedelta("10min"), base, base + pd.Timedelta("20min")],
        "qty": [1.0, 2.0, 3.0, 4.0],
    })
    quotes = pd.DataFrame({
        "sym": ["BTC", "BTC", "ETH", "BTC"],
        "ts": [base - pd.Timedelta("2min"),          # matches trade@0 (2min lag)
               base + pd.Timedelta("9min"),          # matches trade@10 (1min lag)
               base - pd.Timedelta("30min"),         # too old for ETH@0
               base + pd.Timedelta("21min")],        # AFTER trade@20 -> no match
        "px": [100.0, 101.0, 200.0, 102.0],
    })
    (tmp_path / "t").mkdir(); (tmp_path / "q").mkdir()
    spark.createDataFrame(trades).coalesce(1).write.parquet(str(tmp_path / "t" / "f"))
    spark.createDataFrame(quotes).coalesce(1).write.parquet(str(tmp_path / "q" / "f"))

    t_schema = spark.read.parquet(str(tmp_path / "t" / "f")).schema
    q_schema = spark.read.parquet(str(tmp_path / "q" / "f")).schema
    t_stream = spark.readStream.schema(t_schema).parquet(str(tmp_path / "t") + "/*")
    q_stream = spark.readStream.schema(q_schema).parquet(str(tmp_path / "q") + "/*")

    joined = stream_stream_join(
        t_stream, q_stream, keys=["sym"], left_ts="ts", right_ts="ts",
        watermark="1 hour", max_lag="5 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["sym"], r["qty"], r["r_px"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == {("BTC", 1.0, 100.0), ("BTC", 2.0, 101.0)}

    # streaming == batch: same operator on static frames
    static = stream_stream_join(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        keys=["sym"], left_ts="ts", right_ts="ts",
        watermark="1 hour", max_lag="5 minutes",
    )
    got_static = {(r["sym"], r["qty"], r["r_px"]) for r in static.collect()}
    assert got_static == got


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer: trades with no quote in the lag window surface as
    null-context rows instead of disappearing."""
    import pandas as pd

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.joins import (
        stream_stream_join,
    )

    base = pd.Timestamp("2024-06-01 12:00:00")
    late = base + pd.Timedelta("30min")  # watermark pusher: outer rows
    # only emit once BOTH watermarks pass the left row's join window
    trades = pd.DataFrame({
        "sym": ["BTC", "ETH", "ZZZ"],
        "ts": [base, base, late],
        "qty": [1.0, 3.0, 0.0],
    })
    quotes = pd.DataFrame({
        "sym": ["BTC", "ZZZ"],
        "ts": [base - pd.Timedelta("1min"), late],
        "px": [100.0, 0.0],
    })
    (tmp_path / "t").mkdir(); (tmp_path / "q2").mkdir()
    # base data and the late sentinels land in SEPARATE files so
    # maxFilesPerTrigger=1 produces a second batch that carries the
    # advanced watermark (plus Spark's trailing no-data batch flushes
    # the eviction)
    spark.createDataFrame(trades[trades.ts == base]).coalesce(1) \
        .write.parquet(str(tmp_path / "t" / "f0"))
    spark.createDataFrame(trades[trades.ts == late]).coalesce(1) \
        .write.parquet(str(tmp_path / "t" / "f1"))
    spark.createDataFrame(quotes[quotes.ts < late]).coalesce(1) \
        .write.parquet(str(tmp_path / "q2" / "f0"))
    spark.createDataFrame(quotes[quotes.ts == late]).coalesce(1) \
        .write.parquet(str(tmp_path / "q2" / "f1"))
    t_stream = spark.readStream.schema(
        spark.read.parquet(str(tmp_path / "t" / "f0")).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "t") + "/*")
    q_stream = spark.readStream.schema(
        spark.read.parquet(str(tmp_path / "q2" / "f0")).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "q2") + "/*")

    joined = stream_stream_join(
        t_stream, q_stream, keys=["sym"], left_ts="ts", right_ts="ts",
        watermark="1 minute", max_lag="5 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.format("memory").queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["sym"]: r["r_px"]
        for r in spark.sql("SELECT * FROM ssj_outer").collect()
        if r["sym"] != "ZZZ"
    }
    assert got == {"BTC": 100.0, "ETH": None}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stream_stream_join(t_stream, q_stream, keys=["sym"], how="full")


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_equals_batch(spark, tmp_path):
    """r7 (verdict #4): three arrival batches through the persisted
    signature store must reproduce the batch pipeline exactly —
    survivors == exact_dedup over the full corpus (arrival order
    follows the tiebreak here), and the ACCUMULATED candidate pairs ==
    minhash_dedup_pairs over the exact-deduped corpus. Replaying a
    batch id must change nothing."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.dedup_incremental import (
        IncrementalDedup,
    )
    from pyspark.sql import functions as F

    boiler = "the quarterly report shows strong growth in all regions "
    rows = []
    for i in range(60):
        if i % 5 == 0:
            text = boiler * 3  # exact-dup class across batches
        elif i % 5 == 1:
            text = boiler * 3 + f"footnote variant {i} applies here"  # near-dup
        else:
            text = f"unique document {i} " + " ".join(
                f"tok{i}w{j}" for j in range(25)
            )
        rows.append((i, text))
    docs = _mk_docs(spark, rows)
    kw = dict(num_hashes=32, bands=8, n=3, threshold=0.5)

    inc = IncrementalDedup(
        spark, str(tmp_path / "store"), id_col="doc_id", text_col="text", **kw
    )
    got_pairs = []
    for lo, hi, bid in ((0, 20, "b1"), (20, 40, "b2"), (40, 60, "b3")):
        u, p = inc.process_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
        got_pairs += [(r.id_a, r.id_b, r.est_jaccard) for r in p.collect()]

    # survivors == batch exact dedup (arrival order == min-id order)
    want_sur = sorted(
        r.doc_id
        for r in exact_dedup(
            docs.withColumn("key", F.xxhash64("text")), ["key"],
            tiebreak_col="doc_id",
        ).collect()
    )
    got_sur = sorted(r.id for r in inc.survivors().collect())
    assert got_sur == want_sur

    # accumulated pairs == batch minhash pairs over the deduped corpus
    deduped = exact_dedup(
        docs.withColumn("key", F.xxhash64("text")), ["key"],
        tiebreak_col="doc_id",
    ).select("doc_id", "text")
    want_pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_dedup_pairs(
            deduped, id_col="doc_id", text_col="text", **kw
        ).collect()
    }
    got_map = {(a, b): e for a, b, e in got_pairs}
    assert got_map == want_pairs
    assert len(got_pairs) == len(got_map), "a pair fired twice"
    # sanity: the fixture actually produced near-dup pairs
    assert want_pairs

    # replayed batch id: no-op, nothing double-appended
    u, p = inc.process_batch(
        docs.filter(F.col("doc_id") < 20), "b1"
    )
    assert u.count() == 0 and p.count() == 0
    assert sorted(r.id for r in inc.survivors().collect()) == want_sur
    # store-recomputed pair set agrees with the accumulated one
    full = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in inc.all_pairs_from_store().collect()
    }
    assert full == want_pairs


def test_incremental_dedup_foreachBatch_wiring(spark, tmp_path):
    """The attach() writeStream path consumes real micro-batches and
    lands first-arrival uniques in the store."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.dedup_incremental import (
        IncrementalDedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    for i, texts in enumerate((["alpha doc", "beta doc"], ["beta doc", "gamma doc"])):
        pq.write_table(
            pa.table({
                "doc_id": pa.array([i * 10 + j for j in range(len(texts))], type=pa.int64()),
                "text": texts,
            }),
            str(src / f"b{i}.parquet"),
        )
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    inc = IncrementalDedup(
        spark, str(tmp_path / "store"), id_col="doc_id", text_col="text",
        num_hashes=32, bands=8,
    )
    q = inc.attach(stream, checkpoint=str(tmp_path / "ckpt")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got = sorted(r.id for r in inc.survivors().collect())
    assert got == [0, 1, 11]  # 'beta doc' deduped on second arrival


def test_windowed_counts_late_data_vs_batch_twin(spark):
    """r11 verdict #6: out-of-order and LATE event-time micro-batches
    against the watermarked tumbling agg. Asserts the append-mode
    emitted windows equal the BATCH twin computed over (all events −
    the documented late-drop set), where the drop set follows the
    stated watermark rule: an event is dropped iff its event time <
    (max event time of PRIOR micro-batches − delay). Events are
    planted far from the boundary so the expectation is unambiguous.

    Watermark subtlety this test pins (SPARK-24634, Spark ≥3.4): the
    LATE-EVENT filter for batch N uses the watermark in effect during
    batch N−1 (max event time through batch N−2 − delay), while state
    EVICTION uses the current watermark — so a drop needs the pushers
    two batches ahead of the late event.

    Micro-batch script (delay = 10 min; wm = eviction watermark):
      b0: minutes 0,1,7,10            → wm epoch, max 10
      b1: minutes 30,25 + o-o-o 7,2   → wm 0;  late filter epoch → all ACCEPTED
      b2: minutes 22,50               → wm 20; late filter 0     → accepted
      b3: minutes 5,55                → wm 40; late filter 20 → 5 DROPPED
      b4: minute 70 (pusher)          → wm 60 final
    Append emits every window ending ≤ final wm 60, i.e. all planted
    windows except the pusher's own."""
    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(minutes):
        return pd.DataFrame(
            {
                "id": [f"e{m}" for m in minutes],
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
            }
        )

    batches = [
        mk([0, 1, 7, 10]), mk([30, 25, 7, 2]), mk([22, 50]), mk([5, 55]), mk([70])
    ]
    dropped_minutes = [5]  # b3's minute-5 event: 5 < late filter 20
    pusher_minutes = [70]  # its window never closes before termination

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        schema = _write_batches(spark, src, batches)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        out = windowed_counts(
            stream, ts_col="ts", every="1 minute", watermark="10 minutes"
        )
        sink, ckpt = os.path.join(tmp, "sink"), os.path.join(tmp, "ckpt")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")  # append = real late-drop semantics
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(sink).toPandas()

        from pyspark.sql import functions as F

        # batch twin over the surviving events (same window fn, batch API)
        all_pdf = pd.concat(batches, ignore_index=True)
        keep = ~all_pdf["id"].isin(
            [f"e{m}" for m in dropped_minutes + pusher_minutes]
        )
        # NOTE: minute 7 appears in b0 AND b1 (out-of-order re-arrival,
        # both accepted) — the twin must keep both rows
        batch_twin = (
            spark.createDataFrame(all_pdf[keep])
            .groupBy(F.window(F.col("ts").cast("timestamp"), "1 minute").alias("win"))
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("bucket"), "n")
            .toPandas()
        )

    g = got.sort_values("bucket").reset_index(drop=True)
    w = batch_twin.sort_values("bucket").reset_index(drop=True)
    assert list(g["bucket"]) == list(w["bucket"])
    assert list(g["n"]) == list(w["n"])
    # and the drop really happened: minute 5 emitted no window
    assert base + pd.Timedelta(minutes=5) not in set(g["bucket"])


@pytest.mark.parametrize("shape", ["tumbling", "session", "dedup"])
def test_watermark_semantics_breadth_disordered_feed(spark, shape, tmp_path):
    """r13 verdict task #8: the SPARK-24634 disordered-feed harness,
    extended from the tumbling agg to all three stateful shapes. Each
    case feeds one-file micro-batches (maxFilesPerTrigger=1) with
    out-of-order and late events and asserts the APPEND-mode output
    equals the batch twin over (all events − the derived drop set),
    under the two-watermark rule: the late filter for batch N uses
    batch N−1's watermark, state eviction the current one.

    - tumbling: the ST6 windowed count (same script as the r12 test,
      kept here so one parametrized harness covers the family).
    - session: F.session_window — a late-but-accepted event MERGES
      into an open session (minute 8 joins [0,15) → [0,18)); a
      below-filter event drops; the pusher's session stays unflushed.
    - dedup: dropDuplicatesWithinWatermark (ST2) — r13 FOUND AND FIXED
      here: dropDuplicates([id]) under a watermark never evicts state
      (numRowsRemoved stayed 0; unbounded on an infinite stream). The
      bounded-state contract is pinned instead: within-horizon
      re-arrivals suppress (A@2), below-filter events drop (F@15,
      filter=20 during b3), and an id re-arriving after its state
      expired re-emits (B@45 after B@7's state evicted at wm 40) —
      the batch twin is first-per-(id, state epoch), i.e. the
      reference's bounded seen_ids cache, NOT an infinite-memory
      distinct."""
    from pyspark.sql import functions as F

    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(pairs, key="id"):
        return pd.DataFrame(
            {
                key: [p[0] for p in pairs],
                "ts": [base + pd.Timedelta(minutes=p[1]) for p in pairs],
            }
        )

    src = str(tmp_path / "src")
    os.makedirs(src)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    if shape == "tumbling":
        batches = [
            mk([("e", m) for m in ms])
            for ms in ([0, 1, 7, 10], [30, 25, 7, 2], [22, 50], [5, 55], [70])
        ]
        schema = _write_batches(spark, src, batches)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        out = windowed_counts(
            stream, ts_col="ts", every="1 minute", watermark="10 minutes"
        )
        # drop set: minute 5 in b3 (late filter 20); pusher unflushed
        surviving = pd.concat(batches, ignore_index=True)
        surviving = surviving[~surviving["ts"].isin(
            [base + pd.Timedelta(minutes=m) for m in (5, 70)]
        )]
        twin = (
            spark.createDataFrame(surviving)
            .groupBy(F.window(F.col("ts").cast("timestamp"), "1 minute").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("bucket"), "n")
        )
        sort_cols = ["bucket"]
    elif shape == "session":
        batches = [
            mk([("u1", 0), ("u1", 5), ("u1", 40)], key="user_id"),
            mk([("u1", 8), ("u1", 70)], key="user_id"),   # 8 late-but-accepted
            mk([("u1", 12)], key="user_id"),              # 12 < filter 30: drop
            mk([("u1", 120)], key="user_id"),             # pusher, unflushed
        ]
        schema = _write_batches(spark, src, batches)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        out = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                "user_id", F.col("w.start").alias("s"),
                F.col("w.end").alias("e"), "n",
            )
        )
        surviving = pd.concat(batches, ignore_index=True)
        surviving = surviving[~surviving["ts"].isin(
            [base + pd.Timedelta(minutes=m) for m in (12, 120)]
        )]
        twin = (
            spark.createDataFrame(surviving)
            .groupBy(
                F.session_window(F.col("ts").cast("timestamp"), "10 minutes")
                .alias("w"),
                "user_id",
            )
            .agg(F.count("*").alias("n"))
            .select(
                "user_id", F.col("w.start").alias("s"),
                F.col("w.end").alias("e"), "n",
            )
        )
        sort_cols = ["s"]
    else:  # dedup
        batches = [
            mk([("A", 0), ("B", 7), ("C", 10)]),
            mk([("A", 2), ("D", 30)]),   # A@2: within-horizon dup, suppressed
            mk([("E", 50)]),
            mk([("F", 15)]),             # 15 < filter 20: dropped late
            mk([("B", 45)]),             # B state expired (wm 40 > 7+10): re-emit
            mk([("G", 70)]),             # pusher
        ]
        schema = _write_batches(spark, src, batches)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src + "/*")
        )
        out = dedup_stream(stream, id_col="id", ts_col="ts",
                           watermark="10 minutes")
        # batch twin: first occurrence per (id, state epoch) over the
        # non-late events — B appears TWICE (epochs either side of its
        # state eviction), which an infinite-memory distinct would
        # collapse; that divergence IS the bounded-state contract
        twin_rows = [("A", 0), ("B", 7), ("C", 10), ("D", 30), ("B", 45),
                     ("E", 50), ("G", 70)]
        twin = spark.createDataFrame(
            mk(twin_rows)
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        sort_cols = ["ts", "id"]

    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.read.parquet(sink).toPandas()
        .sort_values(sort_cols).reset_index(drop=True)
    )
    want = twin.toPandas().sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(want), (shape, got, want)
    for c in want.columns:
        assert list(got[c]) == list(want[c]), (shape, c, got, want)
