"""Incremental IVF maintenance (r9): append-only upsert into the
persisted index with frozen centroids, exactly-once via the batches
manifest, read-path last-writer-wins, and offline compaction. The
invariant mirrored from the streaming family: results must not depend
on HOW arrivals were batched (incremental == batch)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity import (
    _ivf_lists_path,
    build_ivf_index,
    compact_ivf_index,
    ivf_index_topk,
    ivf_index_upsert,
)

EMB = "/root/testdata/sf0.01/embeddings.parquet"


def _topk(spark, path, k=5, nprobe=8):
    q = spark.read.parquet(EMB).filter(F.col("vec_id") < 5)
    rows = ivf_index_topk(spark, path, q, k=k, nprobe=nprobe).collect()
    return {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 9))
            for r in rows}


def _split(spark):
    emb = spark.read.parquet(EMB)
    hi = emb.agg(F.max("vec_id")).first()[0]
    half, third = hi // 2, hi // 2 + (hi - hi // 2) // 2
    return (
        emb.filter(F.col("vec_id") <= half),
        emb.filter((F.col("vec_id") > half) & (F.col("vec_id") <= third)),
        emb.filter(F.col("vec_id") > third),
    )


def test_upsert_batch_split_invariance(spark):
    """Ingesting the tail in one batch vs two must serve identical
    top-k (frozen centroids make assignment batch-independent)."""
    base, t1, t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d1, tempfile.TemporaryDirectory() as d2:
        p1, p2 = d1 + "/idx", d2 + "/idx"
        build_ivf_index(base, p1, n_centroids=8)
        build_ivf_index(base, p2, n_centroids=8)
        assert ivf_index_upsert(spark, p1, t1.unionByName(t2), batch_id="all")
        assert ivf_index_upsert(spark, p2, t1, batch_id="b1")
        assert ivf_index_upsert(spark, p2, t2, batch_id="b2")
        assert _topk(spark, p1) == _topk(spark, p2)


def test_upsert_replay_is_noop(spark):
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        assert ivf_index_upsert(spark, p, t1, batch_id="b1") is True
        before = _topk(spark, p)
        assert ivf_index_upsert(spark, p, t1, batch_id="b1") is False
        assert _topk(spark, p) == before
        # the replayed rows were never appended
        lists = spark.read.parquet(p + "/lists")
        assert lists.groupBy("vec_id").count().filter("count > 1").count() == 0


def test_reupsert_serves_latest_vector_and_compacts(spark):
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        ivf_index_upsert(spark, p, t1, batch_id="b1")
        # overwrite vec 1 with an exact copy of vec 2's embedding: it
        # must now rank as vec 2's perfect (cosine ~1) neighbor
        v2 = base.filter(F.col("vec_id") == 2).select(
            F.lit(1).cast(base.schema["vec_id"].dataType).alias("vec_id"),
            "embedding",
        )
        ivf_index_upsert(spark, p, v2, batch_id="b2")
        got = ivf_index_topk(
            spark, p, base.filter(F.col("vec_id") == 2), k=1, nprobe=8
        ).collect()
        assert got[0]["neighbor_id"] == 1
        assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)
        # compaction collapses to one latest row per id, same serving;
        # the committed lists now live in a fresh generation dir
        # resolved through the pointer file
        before = _topk(spark, p)
        compact_ivf_index(spark, p)
        lists_dir, folded = _ivf_lists_path(spark, p)
        assert lists_dir.endswith("/lists_g1") and folded == 2
        lists = spark.read.parquet(lists_dir)
        assert lists.groupBy("vec_id").count().filter("count > 1").count() == 0
        assert _topk(spark, p) == before
        # upsert-after-compaction lands in the new generation and serves
        v3 = base.filter(F.col("vec_id") == 3).select(
            F.lit(0).cast(base.schema["vec_id"].dataType).alias("vec_id"),
            "embedding",
        )
        assert ivf_index_upsert(spark, p, v3, batch_id="b3")
        got = ivf_index_topk(
            spark, p, base.filter(F.col("vec_id") == 3), k=1, nprobe=8
        ).collect()
        assert got[0]["neighbor_id"] == 0


def test_compaction_crash_windows_leave_index_readable(spark, monkeypatch):
    """r9 ADVICE (low): the old two-rename swap had a window with NO
    lists directory. Generation commit: a crash BEFORE the pointer
    write leaves the previous generation fully live; re-running the
    compaction succeeds; a rebuilt index resets the generation."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.operators import similarity as sim

    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        ivf_index_upsert(spark, p, t1, batch_id="b1")
        before = _topk(spark, p)

        def boom(*a, **k):
            raise RuntimeError("crash before pointer commit")

        monkeypatch.setattr(sim, "_ivf_write_pointer", boom)
        with pytest.raises(RuntimeError):
            compact_ivf_index(spark, p)
        monkeypatch.undo()
        # old generation still committed and serving identically
        lists_dir, _ = _ivf_lists_path(spark, p)
        assert lists_dir.endswith("/lists")
        assert _topk(spark, p) == before
        # retry succeeds (overwrites the orphaned staging dir)
        compact_ivf_index(spark, p)
        lists_dir, _ = _ivf_lists_path(spark, p)
        assert lists_dir.endswith("/lists_g1")
        assert _topk(spark, p) == before
        # a second compaction advances the generation; the sweep is
        # DEFERRED — it removes generations made stale by the
        # PREVIOUS compaction (gen0 'lists'), while the just-superseded
        # g1 stays on disk for in-flight readers
        ivf_index_upsert(spark, p, t1.limit(0), batch_id="b2")  # no-op rows
        compact_ivf_index(spark, p)
        lists_dir, _ = _ivf_lists_path(spark, p)
        assert lists_dir.endswith("/lists_g2")
        assert _topk(spark, p) == before
        import os
        assert not os.path.exists(p + "/lists")      # swept (2 gens stale)
        assert os.path.exists(p + "/lists_g1")        # deferred for readers
        assert os.path.exists(p + "/lists_g2")
        # full rebuild resets to generation 0
        build_ivf_index(base, p, n_centroids=8)
        lists_dir, folded = _ivf_lists_path(spark, p)
        assert lists_dir.endswith("/lists") and folded == 0


def test_orphaned_upsert_rows_invisible_until_commit(spark, monkeypatch):
    """r10 review fix: an upsert that crashed BETWEEN the lists append
    and its manifest commit marker must be invisible to readers (its
    rows' seq exceeds the committed max) — on a just-compacted index
    the old gate skipped the collapse and served the orphan as a
    duplicate/stale neighbor. Replay commits the batch and makes the
    same rows visible."""
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        ivf_index_upsert(spark, p, t1, batch_id="b1")
        compact_ivf_index(spark, p)  # folded_through_seq = 1
        before = _topk(spark, p)

        # crash the manifest commit: lists rows land, marker doesn't
        real_create = spark.createDataFrame

        def boom(*a, **k):
            raise RuntimeError("crash before manifest commit")

        v2 = base.filter(F.col("vec_id") == 2).select(
            F.lit(1).cast(base.schema["vec_id"].dataType).alias("vec_id"),
            "embedding",
        )
        monkeypatch.setattr(spark, "createDataFrame", boom)
        with pytest.raises(RuntimeError):
            ivf_index_upsert(spark, p, v2, batch_id="b2")
        monkeypatch.setattr(spark, "createDataFrame", real_create)

        # orphan rows exist on disk but must not be served
        assert _topk(spark, p) == before
        # replay commits: now vec 1 serves vec 2's embedding
        assert ivf_index_upsert(spark, p, v2, batch_id="b2") is True
        got = ivf_index_topk(
            spark, p, base.filter(F.col("vec_id") == 2), k=1, nprobe=8
        ).collect()
        assert got[0]["neighbor_id"] == 1
        assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_upserted_index_still_prunes_partitions(spark):
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        ivf_index_upsert(spark, p, t1, batch_id="b1")
        q = spark.read.parquet(EMB).filter(F.col("vec_id") < 3)
        plan = ivf_index_topk(spark, p, q, k=3, nprobe=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "centroid_id" in plan  # probe filter reached the scan


def test_large_query_batch_serve_stays_bounded(spark):
    """r9 verdict #7: the serve path's driver round-trip must be O(1)
    in the query-batch size. With a 5000-query batch: the probe frame
    is computed ONCE (checkpointed — one extra scan would double the
    crossJoin+window work), the collected literal set is the DISTINCT
    probed centroids (<= n_centroids), and the single union read still
    prunes unprobed inverted lists (a list probed by two signature
    groups is scanned once, which is why one union read beats
    per-signature reads)."""
    base, _t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        emb = spark.read.parquet(EMB)
        n_small = emb.count()
        reps = max(1, 5000 // n_small + 1)
        big = (
            emb.crossJoin(spark.range(reps).select(F.col("id").alias("__r")))
            .select(
                (F.col("vec_id") * reps + F.col("__r")).alias("vec_id"),
                "embedding",
            )
            .limit(5000)
        )
        out = ivf_index_topk(spark, p, big, k=2, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one scan of the lists dir, partition-filtered
        lists_scans = [ln for ln in plan.splitlines()
                       if "lists" in ln and "Scan parquet" in ln]
        assert len(lists_scans) == 1, plan
        # every query served k neighbors despite the 5000-query batch
        got = out.groupBy("query_id").count()
        assert got.filter(F.col("count") != 2).count() == 0
        assert got.count() == 5000


def test_orphan_not_resurrected_by_colliding_seq(spark, monkeypatch):
    """r11 advisor fix: seq numbers are allocated as manifest-max + 1,
    so a crashed upsert's orphan rows at seq S collide with the NEXT
    committed batch's seq. Visibility is membership on
    (batch_id, seq), so the orphan must stay invisible even after a
    DIFFERENT batch commits at the same seq — and stay invisible
    forever once its own batch_id replays at a later seq."""
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)
        ivf_index_upsert(spark, p, t1, batch_id="b1")
        before = _topk(spark, p)

        # batch A: remap query vec 0's id onto vec 4's embedding, crash
        # before the manifest commit -> orphan rows at seq 2
        real_create = spark.createDataFrame

        def boom(*a, **k):
            raise RuntimeError("crash before manifest commit")

        vec_a = base.filter(F.col("vec_id") == 4).select(
            F.lit(0).cast(base.schema["vec_id"].dataType).alias("vec_id"),
            "embedding",
        )
        monkeypatch.setattr(spark, "createDataFrame", boom)
        with pytest.raises(RuntimeError):
            ivf_index_upsert(spark, p, vec_a, batch_id="A")
        monkeypatch.setattr(spark, "createDataFrame", real_create)

        # batch B (different id, EMPTY payload) commits at the SAME seq
        assert ivf_index_upsert(spark, p, t1.limit(0), batch_id="B")
        # A's orphan rows must NOT become visible via B's commit
        assert _topk(spark, p) == before

        # A replays under its own batch_id at a fresh seq and commits
        assert ivf_index_upsert(spark, p, vec_a, batch_id="A") is True
        got = ivf_index_topk(
            spark, p, base.filter(F.col("vec_id") == 4), k=1, nprobe=8
        ).collect()
        assert got[0]["neighbor_id"] == 0
        assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)

        # compaction folds committed state only; orphan rows are
        # dropped for good and serving is unchanged
        want = _topk(spark, p)
        compact_ivf_index(spark, p)
        assert _topk(spark, p) == want


def test_concurrent_committed_seq_tie_resolves_deterministically(spark):
    """r11 review fix: two CONCURRENT writers can both allocate
    manifest-max+1 and both commit at the same seq. The LWW key is
    (seq, batch_id), so the collapse must serve ONE deterministic
    winner (lexicographically-last batch_id) — on the serve path AND
    in the compaction fold."""
    base, t1, _t2 = _split(spark)
    with tempfile.TemporaryDirectory() as d:
        p = d + "/idx"
        build_ivf_index(base, p, n_centroids=8)

        # two racing writers remap query vec 0's id onto DIFFERENT
        # embeddings; forge the race by writing batch "b" at the same
        # seq "a" got (both committed in the manifest)
        vid_t = base.schema["vec_id"].dataType
        vec_a = base.filter(F.col("vec_id") == 3).select(
            F.lit(0).cast(vid_t).alias("vec_id"), "embedding")
        assert ivf_index_upsert(spark, p, vec_a, batch_id="a")  # seq 1
        import algorithmic_data_ingestion_for_cryptocurrencies_spark.operators.similarity as sim
        lists_dir, _ = _ivf_lists_path(spark, p)
        (base.filter(F.col("vec_id") == 4)
         .select(F.lit(0).cast(vid_t).alias("vec_id"), "embedding")
         .crossJoin(F.broadcast(spark.read.parquet(p + "/centroids")))
         .withColumn("__d", sim.dot(F.col("embedding"), F.col("centroid")))
         .groupBy("vec_id", "embedding")
         .agg(F.max_by("centroid_id", F.col("__d")).alias("centroid_id"))
         .withColumn("__batch_seq", F.lit(1).cast("bigint"))
         .withColumn("__batch_id", F.lit("b"))
         .write.mode("append").partitionBy("centroid_id").parquet(lists_dir))
        spark.createDataFrame(
            [("b", 1)], "batch_id string, seq bigint"
        ).write.mode("append").parquet(p + "/batches")

        def winner():
            got = ivf_index_topk(
                spark, p, base.filter(F.col("vec_id").isin(3, 4)),
                k=1, nprobe=8,
            ).collect()
            # whichever of vec 3 / vec 4 matches id 0 at cosine ~1 is
            # the served version of the tied id
            return {r["query_id"]: (r["neighbor_id"], round(r["cosine"], 6))
                    for r in got}

        # 'b' > 'a' lexicographically: batch b's embedding (== vec 4)
        # must serve, identically across repeated reads
        first = winner()
        assert first[4] == (0, 1.0), first
        assert first == winner()
        # compaction folds the SAME winner the serve path returned
        compact_ivf_index(spark, p)
        assert winner() == first
