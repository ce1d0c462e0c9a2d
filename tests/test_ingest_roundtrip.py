"""End-to-end ingest parity (SURVEY §3.1; VERDICT r1 next-step #8):
raw adapter rows → normalize (S1/S2/S5) → lake write (S15) → feature
stage → feature-store write (S16) → point/range reads (S17/S18), plus
the JSON payload surface (missing item #4) and the training-matrix
builder (#5).
"""

from __future__ import annotations

import json
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.functions.payload import (
    flatten_struct,
    parse_payload,
    with_feature_payload,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (
    build_market_features,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.schemas import (
    MARKET_SCHEMA,
    ONCHAIN_SCHEMA,
    ORDERBOOK_SCHEMA,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.adapters import (
    normalize_ohlcv,
    normalize_onchain,
    normalize_order_book,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.lake import (
    read_lake,
    write_lake,
)
from algorithmic_data_ingestion_for_cryptocurrencies_spark.store.feature_store import (
    FeatureStore,
)


@pytest.fixture(scope="module")
def ohlcv_rows():
    rng = np.random.default_rng(5)
    base_ms = 1_700_000_000_000  # ms epoch (heuristic must pick ms)
    close = 100 + np.cumsum(rng.normal(0, 1, 120))
    return [
        [
            base_ms + i * 60_000,
            float(close[i] - 0.1),
            float(close[i] + 0.5),
            float(close[i] - 0.5),
            float(close[i]),
            float(10 + i % 5),
        ]
        for i in range(120)
    ]


def test_normalize_ohlcv_schema_and_units(spark, ohlcv_rows):
    df = normalize_ohlcv(
        spark, ohlcv_rows, symbol="BTC/USDT", exchange="binance", timeframe="1m"
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in MARKET_SCHEMA.fields]
    first = df.orderBy("timestamp").first()
    assert str(first["timestamp"]).startswith("2023-11-14")  # ms heuristic
    assert first["dt"] == "2023-11-14"
    assert df.count() == 120


def test_normalize_order_book(spark):
    df = normalize_order_book(
        spark,
        bids=[[100.0, 2.0], [99.5, 1.0]],
        asks=[[100.5, 1.5], [101.0, 3.0]],
        symbol="BTC/USDT",
        exchange="binance",
        snapshot_epoch_ms=1_700_000_000_000,
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in ORDERBOOK_SCHEMA.fields]
    rows = df.collect()
    assert sorted(r["side"] for r in rows) == ["ask", "ask", "bid", "bid"]


def test_normalize_onchain_unit_heuristic(spark):
    # one point in seconds, one in ms — per-value unit detection
    df = normalize_onchain(
        spark,
        [[1_700_000_000, 1.5], [1_700_000_060_000, 2.5]],
        source="glassnode",
        symbol="BTC",
        metric="active_addresses",
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in ONCHAIN_SCHEMA.fields]
    ts = sorted(r["timestamp"] for r in df.collect())
    # mixed units land 60 s apart, not 1000x apart
    assert (ts[1] - ts[0]).total_seconds() == 60.0


def test_ingest_roundtrip_lake_features_store(spark, ohlcv_rows):
    market = normalize_ohlcv(
        spark, ohlcv_rows, symbol="BTC/USDT", exchange="binance", timeframe="1m"
    )
    with tempfile.TemporaryDirectory() as tmp:
        lake = f"{tmp}/lake"
        store_path = f"{tmp}/features"

        write_lake(market, lake, domain="market",
                   partition_by=("exchange", "symbol", "dt"))
        back = read_lake(spark, lake)
        assert back.count() == 120

        feats = build_market_features(back, dropna_final=False)
        store = FeatureStore(spark, store_path)
        store.write(feats, domain="market")

        # range read: limit + reverse (ZRANGEBYSCORE parity)
        lo = 1_700_000_000
        hi = lo + 120 * 60
        got = store.range_read(
            "market", "BTC/USDT", "1m", lo, hi, limit=10, reverse=True
        ).collect()
        assert len(got) == 10
        epochs = [r["ts_epoch"] for r in got]
        assert epochs == sorted(epochs, reverse=True)

        # point read hits exactly one bar
        one = store.read("market", "BTC/USDT", "1m", lo + 60 * 60)
        assert one.count() == 1


def test_feature_payload_json_roundtrip(spark):
    pdf = pd.DataFrame(
        {"ret_1": [0.01, float("nan")], "rsi_14": [55.0, float("inf")]}
    )
    df = spark.createDataFrame(pdf)
    out = with_feature_payload(df, ["ret_1", "rsi_14"]).collect()
    p0 = json.loads(out[0]["payload"])
    assert p0 == {"ret_1": 0.01, "rsi_14": 55.0}
    p1 = json.loads(out[1]["payload"])  # NaN/Inf sanitized to null/omitted
    assert p1.get("ret_1") is None and p1.get("rsi_14") is None

    parsed = df.select(
        parse_payload(
            F.lit('{"info": {"symbol": "BTCUSDT", "last": "101.5"}}'),
            "info struct<symbol:string,last:string>",
        ).alias("payload")
    )
    flat = flatten_struct(parsed, "payload")
    row = flatten_struct(flat, "info", prefix="info").first()
    assert row["info.symbol"] == "BTCUSDT" and row["info.last"] == "101.5"


def test_training_matrix_with_social_news(spark, ohlcv_rows):
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.datasets.training import (
        build_training_matrix,
    )

    market = normalize_ohlcv(
        spark, ohlcv_rows, symbol="BTC/USDT", exchange="binance", timeframe="1m"
    )
    base = pd.Timestamp("2023-11-14 22:13:20")
    social = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": [base + pd.Timedelta(minutes=i) for i in range(0, 60, 3)],
                "id": [f"p{i}" for i in range(20)],
                "sentiment_score": np.linspace(-1, 1, 20),
            }
        )
    )
    news = spark.createDataFrame(
        pd.DataFrame(
            {
                "published_at": [base + pd.Timedelta(minutes=i) for i in range(0, 40, 2)],
                "id": [f"n{i}" for i in range(20)],
            }
        )
    )
    out = build_training_matrix(market, social=social, news=news, timeframe="1m")
    pdf = out.orderBy("timestamp").toPandas()
    assert {"ret_next", "y_dir", "sentiment_mean", "social_n", "news_n"} <= set(pdf.columns)
    # zero-filled where no social/news bucket exists
    assert (pdf["social_n"] >= 0).all() and (pdf["news_n"] >= 0).all()
    assert pdf["ret_next"].notna().all()  # unlabeled tail dropped


def test_training_matrix_fused_news_flag_matches_two_frame_path(spark, ohlcv_rows):
    """r14 single-pass rollup: when the news feed is a flagged subset
    of the social feed, ``news_flag_col`` must produce exactly the
    frame the separate-frames path produces (same columns, same values
    row for row) — one scan/aggregate/join instead of two."""
    import pytest
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.datasets.training import (
        build_training_matrix,
    )

    market = normalize_ohlcv(
        spark, ohlcv_rows, symbol="BTC/USDT", exchange="binance", timeframe="1m"
    )
    base = pd.Timestamp("2023-11-14 22:13:20")
    events = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=i) for i in range(0, 60, 3)],
            "id": [f"p{i}" for i in range(20)],
            "sentiment_score": np.linspace(-1, 1, 20),
            # mark a strict subset as news rows, leaving some buckets
            # with social-but-no-news (the COALESCE-to-0 branch)
            "is_news": [i % 3 == 0 for i in range(20)],
        }
    )
    social = spark.createDataFrame(events)
    news = spark.createDataFrame(
        events[events["is_news"]][["ts", "id"]].rename(columns={"ts": "published_at"})
    )
    split = build_training_matrix(
        market, social=social.drop("is_news"), news=news, timeframe="1m"
    )
    fused = build_training_matrix(
        market, social=social, news_flag_col="is_news", timeframe="1m"
    )
    a = split.orderBy("timestamp").toPandas()
    b = fused.orderBy("timestamp").toPandas()
    assert sorted(a.columns) == sorted(b.columns)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(a.columns)], check_dtype=True
    )
    with pytest.raises(ValueError):
        build_training_matrix(
            market, social=social, news=news, news_flag_col="is_news"
        )


def test_ttl_sweep_and_coalesce_text(spark):
    """ST8 retention sweep keeps only live rows; P7 text coalescing
    picks the first non-null candidate column."""
    import tempfile

    import pandas as pd

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.functions.cleaning import (
        coalesce_text,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.store.feature_store import (
        FeatureStore,
    )

    now = 1_700_100_000
    pdf = pd.DataFrame(
        {
            "timestamp": pd.to_datetime(
                [now - 10_000, now - 5_000, now - 100, now - 50], unit="s"
            ).astype("datetime64[us]"),
            "symbol": "BTC/USDT",
            "timeframe": "1m",
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        store = FeatureStore(spark, f"{tmp}/store")
        store.write(spark.createDataFrame(pdf), domain="market")
        live = store.ttl_sweep(now, ttl_seconds=1_000, out_path=f"{tmp}/live")
        assert sorted(r["value"] for r in live.collect()) == [3.0, 4.0]
        assert spark.read.parquet(f"{tmp}/live").count() == 2

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "content": [None, "from content", None],
                "selftext": ["from selftext", None, None],
                "summary": [None, None, "from summary"],
            }
        )
    )
    got = [r["text"] for r in coalesce_text(df).collect()]
    assert set(got) == {"from selftext", "from content", "from summary"}


def test_periodic_ingest_processing_time_trigger(spark, tmp_path):
    """ST10: a processingTime-triggered query keeps draining the source
    on its interval — files that arrive AFTER the query starts are
    ingested by a later tick with no external scheduler (the engine
    replaces the reference's APScheduler cron loop)."""
    import os
    import time as _time

    import pandas as pd

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.ingest import (
        read_file_stream,
        start_periodic_ingest,
    )

    src = tmp_path / "src"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_file(name, lo, mtime):
        pdf = pd.DataFrame({"x": range(lo, lo + 5)})
        path = str(src / name)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (mtime, mtime))

    write_file("f0.parquet", 0, 1_700_000_000)
    schema = spark.read.parquet(str(src / "f0.parquet")).schema
    stream = read_file_stream(spark, str(src) + "/*", schema, max_files_per_trigger=10)
    q = start_periodic_ingest(
        stream, sink_path=str(sink), checkpoint=str(ckpt), interval="1 seconds"
    )
    try:
        deadline = _time.time() + 30
        while _time.time() < deadline and not os.path.isdir(sink):
            _time.sleep(0.5)
        # second file lands while the query is already running
        write_file("f1.parquet", 100, 1_700_000_100)
        got = set()
        while _time.time() < deadline and len(got) < 10:
            _time.sleep(0.5)
            try:
                got = {r["x"] for r in spark.read.parquet(str(sink)).collect()}
            except Exception:
                pass
    finally:
        q.stop()
    assert got == set(range(5)) | set(range(100, 105))


def test_kafka_contract_options_and_record_decode(spark):
    """r5 verdict #7: the Kafka wire path can't run jar-free, but its
    two halves can — (a) the source option contract, (b) the
    from_json record decode driven by a static frame shaped like
    Kafka's output (binary value + topic/partition/offset metadata)."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.ingest import (
        KAFKA_FORMAT,
        kafka_source_options,
        parse_kafka_json,
    )

    assert KAFKA_FORMAT == "kafka"
    opts = kafka_source_options("broker1:9092,broker2:9092", "ticks")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ticks",
        "startingOffsets": "latest",
    }
    assert kafka_source_options("b:9092", "t", starting_offsets="earliest")[
        "startingOffsets"
    ] == "earliest"

    schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", LongType()),
        StructField("price", DoubleType()),
    ])
    records = [
        {"symbol": "BTC/USDT", "ts": 1700000000000, "price": 42000.5},
        {"symbol": "ETH/USDT", "ts": 1700000001000, "price": 2200.25},
    ]
    # Kafka's output schema: key/value binary + metadata columns
    wire = spark.createDataFrame(
        [
            (None, json.dumps(r).encode("utf-8"), "ticks", 0, i, None)
            for i, r in enumerate(records)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    out = parse_kafka_json(wire, schema)
    assert out.schema == schema
    rows = [r.asDict() for r in out.orderBy("ts").collect()]
    assert rows == records
    # a corrupt payload decodes to NULLs, never a stream-killing error
    bad = spark.createDataFrame(
        [(None, b"{not json", "ticks", 0, 0, None)], wire.schema
    )
    brow = parse_kafka_json(bad, schema).first()
    assert brow["symbol"] is None and brow["price"] is None


def test_kafka_wire_path_integration(spark, tmp_path):
    """r7 (verdict #3): REAL wire-path run of read_kafka_stream —
    consumes at least one micro-batch from a live broker. Skipped
    unless the environment provides the connector jar and a broker:

        SPARK_KAFKA_JAR=/path/spark-sql-kafka-0-10_2.13-<ver>.jar \\
        KAFKA_BOOTSTRAP=host:9092 KAFKA_TEST_TOPIC=adi-test pytest ...

    This round's fetch attempt is documented in ROUND7_NOTES: the
    sandbox has no DNS and an egress proxy denies raw-IP TLS/HTTP
    (403), so the jar cannot be downloaded and no broker exists; the
    jar-free contract halves (option assembly + record decode) are
    covered above."""
    import os

    jar = os.environ.get("SPARK_KAFKA_JAR")
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not (jar and bootstrap):
        pytest.skip("no Kafka connector jar / broker in this environment")

    from pyspark.sql.types import StructType

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.ingest import (
        read_kafka_stream,
    )

    schema = (
        StructType()
        .add("symbol", "string")
        .add("price", "double")
        .add("ts", "timestamp")
    )
    topic = os.environ.get("KAFKA_TEST_TOPIC", "adi-test")
    stream = read_kafka_stream(
        spark, bootstrap, topic, schema, starting_offsets="earliest"
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() >= 1
    assert set(got.columns) == {"symbol", "price", "ts"}
