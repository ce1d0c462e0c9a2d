"""IVF ANN recall and the ST5 gap-detect -> backfill -> verify round
trip (the reference's §3.3 admin flow)."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
    ivf_topk,
    knn_join,
)


def test_ivf_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in knn_join(q, emb, k=5).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(q, emb, k=5, n_centroids=16, nprobe=8).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_portable_quantizer_recall_matches_kmeans(spark):
    """quantizer="portable" (r11) is the library Lloyd k-means with an
    order-independent fixed-point mean — the per-element change is
    <= 2^-40, so recall must match the float-mean default (0.96@8 on
    this data for both)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in knn_join(q, emb, k=5).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            q, emb, k=5, n_centroids=16, nprobe=8, quantizer="portable"
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_portable_mean_tracks_float_mean_bitwise_close(spark):
    """The fixed-point Lloyd mean deviates from the float mean by at
    most the 2^-40 input quantization plus one float rounding step —
    per-element agreement to 1e-6 absolute over 3 full iterations
    (assignment identity would amplify any real divergence)."""
    import numpy as np

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["centroid_id"]: np.asarray(r["centroid"], dtype=np.float64)
         for r in kmeans_centroids(emb, 8, iterations=3).collect()}
    b = {r["centroid_id"]: np.asarray(r["centroid"], dtype=np.float64)
         for r in kmeans_centroids(
             emb, 8, iterations=3, mean="scaled_int"
         ).collect()}
    assert set(a) == set(b)
    worst = max(float(np.max(np.abs(a[c] - b[c]))) for c in a)
    assert worst <= 1e-6, worst


def test_hash_centroids_deterministic_uniform_sample(spark):
    """hash_centroids: k rows, ids 0..k-1, stable across runs, and the
    chosen seeds are the k smallest (md5-prefix, id) — the portable
    uniform-sample contract."""
    import hashlib

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        hash_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = hash_centroids(emb, 8).collect()
    assert sorted(r["centroid_id"] for r in got) == list(range(8))
    again = hash_centroids(emb, 8).collect()
    assert {r["centroid_id"]: r["centroid"] for r in got} == {
        r["centroid_id"]: r["centroid"] for r in again
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    expect = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:8], i)
    )[:8]
    chosen = {tuple(r["centroid"]) for r in got}
    by_id = {
        r["vec_id"]: tuple(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(expect)).collect()
    }
    assert chosen == set(by_id.values())


def test_gap_detect_and_backfill_roundtrip(spark):
    """§3.3 parity: write features with a hole, detect exactly the
    missing bars, backfill them, verify the gap closes."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.store.feature_store import (
        FeatureStore,
    )

    import pandas as pd

    n = 48
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    pdf = pd.DataFrame(
        {
            "timestamp": ts.astype("datetime64[us]"),
            "symbol": "BTC/USDT",
            "timeframe": "1h",
            "value": np.arange(n, dtype=float),
        }
    )
    hole = pdf.iloc[10:20]          # 10 missing bars
    present = pd.concat([pdf.iloc[:10], pdf.iloc[20:]])

    with tempfile.TemporaryDirectory() as tmp:
        store = FeatureStore(spark, tmp)
        store.write(spark.createDataFrame(present), domain="market")

        missing = store.find_missing_bars(
            "market", "BTC/USDT", "1h", "2024-01-01 00:00:00", "2024-01-02 23:00:00"
        )
        got = sorted(r["expected_ts"] for r in missing.collect())
        assert got == sorted(hole["timestamp"].dt.to_pydatetime())

        # backfill exactly the missing bars, then the gap is closed
        store.write(spark.createDataFrame(hole), domain="market")
        assert (
            store.find_missing_bars(
                "market", "BTC/USDT", "1h", "2024-01-01 00:00:00", "2024-01-02 23:00:00"
            ).count()
            == 0
        )
        # and the store serves the full contiguous range
        full = store.range_read(
            "market", "BTC/USDT", "1h",
            int(pd.Timestamp("2024-01-01").timestamp()),
            int(pd.Timestamp("2024-01-02 23:00:00").timestamp()),
        )
        assert full.count() == n


def test_arrow_near_pairs_match_exact_tier(spark):
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        embedding_near_pairs,
        embedding_near_pairs_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_pairs(emb, 0.3).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_pairs_arrow(emb, 0.3).collect()
    }
    # any set difference must sit within float noise of the threshold
    for pair in set(exact) ^ set(fast):
        cos = exact.get(pair, fast.get(pair))
        assert abs(cos - 0.3) < 1e-5
    # shared pairs agree to float32-matmul precision
    import numpy as np

    common = set(exact) & set(fast)
    diffs = np.array([abs(exact[p] - fast[p]) for p in common])
    assert diffs.max() < 1e-5


def test_arrow_flagship_matches_expression_plan(spark):
    import numpy as np

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.driver_queries import (
        REGISTRY,
        _market,
    )
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.indicators import (
        build_market_features_arrow,
    )

    sf = "/root/testdata/sf0.001"
    a = build_market_features_arrow(
        _market(spark, sf), keys=["suppkey"], ts_col="ts",
        order_cols=["ts", "okey", "lnum", "pkey"], id_cols=["okey", "lnum"],
    ).toPandas()
    fn, _sql = REGISTRY["flagship_market_features"]
    b = fn(spark, sf).toPandas()  # rounded to 1e-6 by the registry
    mrg = a.merge(b, on=["suppkey", "ts", "okey", "lnum"], suffixes=("_a", "_b"))
    assert len(mrg) == len(a) == len(b)
    for c in ["ret_1", "ema_12", "macd_signal_9", "rsi_14", "oi_obv"]:
        x, y = mrg[c + "_a"].to_numpy(), mrg[c + "_b"].to_numpy()
        m = ~(np.isnan(x) | np.isnan(y))
        assert (np.isnan(x) == np.isnan(y)).all()
        assert np.abs(x[m] - y[m]).max() <= 5.1e-7  # rounding quantum


def test_arrow_near_pairs_cap_guard_routes_to_lsh(spark):
    """Above max_broadcast_vectors the arrow tier must NOT collect to
    the driver: with dim it fails over to the bucketed-LSH candidate
    join (plan shows a Join, no Python map stage); without dim it
    raises instead of silently collecting."""
    import pytest as _pytest

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        embedding_near_pairs_arrow,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])

    routed = embedding_near_pairs_arrow(
        emb, 0.3, max_broadcast_vectors=10, dim=dim
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "MapInPandas" not in plan
    assert routed.columns == ["id_a", "id_b", "cosine"]
    routed.limit(5).collect()  # executes end-to-end

    with _pytest.raises(ValueError, match="max_broadcast_vectors"):
        embedding_near_pairs_arrow(emb, 0.3, max_broadcast_vectors=10)


def test_exact_near_pairs_cap_guard_never_goes_quadratic(spark):
    """The exact tier must count-and-route above max_exact_vectors:
    with dim it switches to the bucketed LSH join (no cartesian in the
    plan); without dim it raises. Under the cap the all-pairs plan is
    allowed (r3 verdict #4)."""
    import pytest as _pytest

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        embedding_near_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])

    routed = embedding_near_pairs(emb, 0.3, max_exact_vectors=10, dim=dim)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Join" in plan
    assert routed.columns == ["id_a", "id_b", "cosine"]
    routed.limit(5).collect()

    with _pytest.raises(ValueError, match="max_exact_vectors"):
        embedding_near_pairs(emb, 0.3, max_exact_vectors=10)

    # under the cap: exact all-pairs allowed (and is the oracle tier)
    exact = embedding_near_pairs(emb, 0.3)
    assert exact.columns == ["id_a", "id_b", "cosine"]


def test_unroll_guard_keeps_hof_tier_above_threshold(spark):
    """r4 regression guard: dim above UNROLL_MAX_DIM must NOT unroll
    (the 64-term element_at chain measured 3-5x slower than the HOF
    tier — tools/bench_unroll_dim.py); at or below the threshold the
    unrolled tier must be bit-identical to the HOF tier."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        UNROLL_MAX_DIM,
        cosine,
        dot,
        norm,
    )

    # above threshold: expression contains aggregate(), no element_at
    big = str(dot(F.col("a"), F.col("b"), dim=64)._jc)
    assert "aggregate" in big and "element_at" not in big
    assert "element_at" not in str(norm(F.col("a"), dim=64)._jc)

    # at/below threshold: unrolled, and values match HOF bit-exactly
    df = spark.range(50).select(
        F.array(
            *[(F.col("id") * (i + 1) % 13).cast("float") / 13.0 for i in range(UNROLL_MAX_DIM)]
        ).alias("a"),
        F.array(
            *[(F.col("id") * (i + 3) % 7).cast("float") / 7.0 for i in range(UNROLL_MAX_DIM)]
        ).alias("b"),
    )
    small = str(dot(F.col("a"), F.col("b"), dim=UNROLL_MAX_DIM)._jc)
    assert "element_at" in small
    rows = df.select(
        cosine("a", "b").alias("hof"),
        cosine("a", "b", dim=UNROLL_MAX_DIM).alias("unrolled"),
    ).collect()
    assert all(r["hof"] == r["unrolled"] for r in rows)  # bit-identical


def test_unrolled_dim_mismatch_surfaces_not_silent(spark):
    """ADVICE r4: the unrolled tier's dim must equal the array length.
    Larger dim makes element_at return NULL (non-ANSI) so the score
    goes NULL — rows must surface as NULL, never as a wrong number;
    the HOF tier is immune (always full array)."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        UNROLL_MAX_DIM,
        dot,
    )

    short = UNROLL_MAX_DIM - 1
    df = spark.range(5).select(
        F.array(*[F.lit(1.0).cast("float")] * short).alias("a"),
        F.array(*[F.lit(1.0).cast("float")] * short).alias("b"),
    )
    out = df.select(
        dot("a", "b", dim=UNROLL_MAX_DIM).alias("over"),
        dot("a", "b").alias("hof"),
    ).collect()
    assert all(r["over"] is None for r in out)   # surfaces as NULL
    assert all(r["hof"] == float(short) for r in out)


def test_capped_near_pairs_bounded_and_subset_of_exact(spark):
    """The budgeted tier must (a) never score more than cap vectors
    per bucket, (b) emit a SUBSET of the exact all-pairs result with
    identical cosines on shared pairs, (c) be invariant to input
    partitioning (deterministic md5 cap)."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        embedding_near_pairs,
        embedding_near_pairs_capped,
        with_lsh_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    cap = 20

    capped = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_pairs_capped(
            emb, 0.3, dim=dim, n_planes=2, cap=cap
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_pairs(emb, 0.3).collect()
    }
    assert capped, "capped tier found no pairs at all"
    assert set(capped) <= set(exact)
    assert all(exact[p] == capped[p] for p in capped)  # bit-identical

    # occupancy after the cap: every bucket <= cap survivors
    occ = (
        with_lsh_bucket(emb, vec_col="embedding", dim=dim, n_planes=2)
        .groupBy("lsh_bucket").count().collect()
    )
    assert any(r["count"] > cap for r in occ), "cap never binds — weak test"

    repart = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs_capped(
            emb.repartition(7), 0.3, dim=dim, n_planes=2, cap=cap
        ).collect()
    }
    assert repart == set(capped)


def test_persisted_ivf_index_prunes_partitions_and_recalls(spark, tmp_path):
    """The stored IVF layout's probe must be PLAIN PARTITION PRUNING:
    the lists scan carries a centroid_id partition filter (asserted in
    the plan), and recall vs exact kNN stays high."""
    from pyspark.sql import functions as F

    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=16)

    q = emb.filter(F.col("vec_id") < 20)
    out = ivf_index_topk(spark, path, q, k=5, nprobe=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan

    approx = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_join(q, emb, k=5).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_hash_quantizer_recall_sanity(spark):
    """quantizer="hash" (seed-sample, no Lloyd) is the cheap build
    option: recall is lower than the Lloyd quantizers by design —
    pin a floor so the mode stays usable (measured 0.73@nprobe=8 on
    this uniform-sphere data; real clustered embeddings do better)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in knn_join(q, emb, k=5).collect()}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            q, emb, k=5, n_centroids=16, nprobe=8, quantizer="hash"
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.6


def test_ivf_and_semantic_dedup_empty_corpus(spark):
    """Empty-corpus edges return typed empty frames (the map-only
    assignment guard, r11): no crash building expressions over zero
    centroids."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(0)
    out = ivf_topk(emb, emb, k=3, n_centroids=8, quantizer="portable")
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    sd = semantic_dedup(emb, n_clusters=8, threshold=0.9)
    assert sd.count() == 0
    assert sd.columns == ["vec_id", "cluster_id", "component", "keep"]


def test_assignment_tiers_agree_above_threshold(spark, monkeypatch):
    """The large-k broadcast-join assignment tier (above
    ASSIGN_EXPR_MAX_CENTROIDS, the 100k-cluster SemDeDup regime) must
    produce row-identical results to the map-only expression tier —
    same argmax, same (dot DESC, centroid_id) tie order."""
    import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)

    def run():
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
            for r in ivf_topk(
                q, emb, k=5, n_centroids=80, nprobe=20, quantizer="hash"
            ).collect()
        }

    monkeypatch.setattr(sim, "ASSIGN_EXPR_MAX_CENTROIDS", 128)
    small = run()  # expression tier (80 <= 128)
    monkeypatch.setattr(sim, "ASSIGN_EXPR_MAX_CENTROIDS", 64)
    large = run()  # join tier (80 > 64)
    assert small == large


def test_null_vector_assignment_is_null_in_both_tiers(spark, monkeypatch):
    """Dirty-input contract (r11 advisor): a NULL or malformed (null
    element) vector gets a NULL centroid assignment in BOTH tiers —
    the map-only greatest() expression must not fall through the
    struct tiebreak to centroid 0, and the broadcast-join tier must
    not differ. Probe lists are NULL for the same inputs."""
    import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [None, 1.0])],
        "vec_id int, embedding array<float>",
    )
    crows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5, 0.5])]
    cents = spark.createDataFrame(
        crows, "centroid_id int, centroid array<float>"
    )
    for cap in (64, 2):  # expression tier, then broadcast-join tier
        monkeypatch.setattr(sim, "ASSIGN_EXPR_MAX_CENTROIDS", cap)
        got = {
            r["vec_id"]: r["centroid_id"]
            for r in sim._assigned_frame(
                df, cents, crows, vec_col="embedding", dim=2
            ).collect()
        }
        assert got == {0: 0, 1: None, 2: None}, (cap, got)

    probes = {
        r["vec_id"]: r["p"]
        for r in df.select(
            "vec_id", sim._probe_expr("embedding", crows, 2, dim=2).alias("p")
        ).collect()
    }
    assert probes[0] == [0, 2] and probes[1] is None and probes[2] is None


def test_null_vectors_through_kmeans_probe_and_ivf(spark, monkeypatch):
    """r12 review: the NULL-assignment contract must hold through the
    CONSUMERS, not just the expression helpers — (a) kmeans_centroids
    completes on a dirty corpus (the NULL group is excluded from the
    means; previously int(None) crashed the Lloyd collect), (b) both
    _probed_frame tiers DROP a NULL query identically, (c) end-to-end
    ivf_topk: a NULL query emits no rows, a NULL corpus vector is
    never a neighbor."""
    import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim

    clean = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(40)
    )
    dim = len(clean.first()["embedding"])
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(10_001, None), (10_002, [None] + [1.0] * (dim - 1))],
            "vec_id long, embedding array<float>",
        ).select("vec_id", F.col("embedding").cast("array<float>"))
    )

    for mean in ("float", "scaled_int"):
        cents = sim.kmeans_centroids(dirty, 4, iterations=2, mean=mean)
        assert cents.count() >= 1  # Lloyd completed on dirty input

    crows = sim._cent_rows(sim.hash_centroids(clean, 8))
    cents_df = spark.createDataFrame(
        crows, "centroid_id int, centroid array<float>"
    )
    q = dirty.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec")
    )
    probed = {}
    for cap in (64, 2):  # expr tier, then join tier
        monkeypatch.setattr(sim, "ASSIGN_EXPR_MAX_CENTROIDS", cap)
        probed[cap] = {
            (r["query_id"], r["centroid_id"])
            for r in sim._probed_frame(q, cents_df, crows, 3, dim=dim).collect()
        }
    assert probed[64] == probed[2]  # tier identity on dirty input
    assert not any(qid >= 10_001 for qid, _ in probed[64])  # nulls dropped

    out = sim.ivf_topk(
        dirty.filter(F.col("vec_id").isin(10_001, int(clean.first()["vec_id"]))),
        dirty, k=3, n_centroids=4, nprobe=4, quantizer="hash",
    ).collect()
    assert out, "clean query must still return neighbors"
    assert all(r["query_id"] != 10_001 for r in out)
    assert all(r["neighbor_id"] not in (10_001, 10_002) for r in out)
