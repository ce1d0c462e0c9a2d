"""Incremental time-bucket rollups (continuous aggregates).

The streaming-ingest side of the engine lands raw rows in micro-batches
(:mod:`..streaming.ingest`); analytics wants per-bucket stats over the
whole history without rescanning it. The standard warehouse answer is a
*continuous aggregate* (TimescaleDB) / *materialized rollup* (Druid,
Pinot): keep per-bucket **partial aggregation states** that are
(a) mergeable — state(A ∪ B) = merge(state(A), state(B)) — and
(b) cheap to finalize into count/mean/min/max/std.

Design (append + compact, the log-structured shape that scales):

- :func:`rollup_state` turns raw rows into per-(keys, bucket) states,
  tagged with a caller-supplied ``batch_id``. One map-side-combined
  ``groupBy`` — an increment touching B buckets shuffles B rows.
- :func:`upsert_rollup` APPENDS the increment's state rows to the
  rollup table (new Parquet files only — no read-modify-write of
  existing data, so concurrent readers never see a torn table).
  Re-running a failed/duplicated batch re-appends byte-identical rows;
  :func:`read_rollup` drops exact duplicates on (keys, bucket,
  batch_id) first, which makes the upsert **idempotent per batch_id**.
- :func:`read_rollup` merges all batch states per bucket at query time
  (sum/sum/min/max/sum — one aggregate over the state table, which is
  ~#buckets × #batches-since-compaction rows, not raw-data-sized) and
  optionally finalizes.
- :func:`compact_rollup` collapses the accumulated batch states into
  one ``__compacted`` state per bucket (staged write + swap), bounding
  read-side merge work; run it on the scheduler cadence
  (:mod:`..streaming.scheduler`).

No counterpart in the reference (its Redis store keeps only final
feature values — ``redis_store.py`` — and recomputes aggregates from
raw on every backfill); this is the beyond-reference scale surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

COMPACTED_BATCH = "__compacted"


def _state_cols(c: str) -> list[str]:
    return [f"n_{c}", f"sum_{c}", f"min_{c}", f"max_{c}", f"sumsq_{c}"]


def rollup_state(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str,
    bucket_seconds: int,
    val_cols: Sequence[str],
    batch_id: str,
) -> DataFrame:
    """Per-(keys, bucket_ts) mergeable aggregation state for each value
    column: count, sum, min, max, sum of squares. ``bucket_ts`` is the
    bucket's start epoch second."""
    b = (
        F.floor(F.col(ts_col).cast("long") / F.lit(bucket_seconds))
        * F.lit(bucket_seconds)
    ).cast("long")
    aggs: list[F.Column] = []
    for c in val_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(c).alias(f"n_{c}"),
            F.sum(v).alias(f"sum_{c}"),
            F.min(v).alias(f"min_{c}"),
            F.max(v).alias(f"max_{c}"),
            F.sum(v * v).alias(f"sumsq_{c}"),
        ]
    return (
        df.withColumn("bucket_ts", b)
        .groupBy(*keys, "bucket_ts")
        .agg(*aggs)
        .withColumn("batch_id", F.lit(batch_id))
    )


def merge_rollup_states(
    states: DataFrame, *, keys: Sequence[str], val_cols: Sequence[str]
) -> DataFrame:
    """Merge partial states across batches: counts/sums/sumsq add,
    min/max combine. Associative + commutative, so any merge order
    (and any partial compaction history) yields the same state."""
    aggs: list[F.Column] = []
    for c in val_cols:
        aggs += [
            F.sum(f"n_{c}").alias(f"n_{c}"),
            F.sum(f"sum_{c}").alias(f"sum_{c}"),
            F.min(f"min_{c}").alias(f"min_{c}"),
            F.max(f"max_{c}").alias(f"max_{c}"),
            F.sum(f"sumsq_{c}").alias(f"sumsq_{c}"),
        ]
    return states.groupBy(*keys, "bucket_ts").agg(*aggs)


def finalize_rollup(
    state: DataFrame, *, val_cols: Sequence[str]
) -> DataFrame:
    """Finalize merged states into count/mean/min/max/std (population
    std via E[x²]−E[x]², clamped at 0 against FP negatives)."""
    out = state
    for c in val_cols:
        n = F.col(f"n_{c}").cast("double")
        mean = F.col(f"sum_{c}") / n
        var = F.greatest(
            F.col(f"sumsq_{c}") / n - mean * mean, F.lit(0.0)
        )
        out = (
            out.withColumn(f"mean_{c}", mean)
            .withColumn(f"std_{c}", F.sqrt(var))
            .drop(f"sum_{c}", f"sumsq_{c}")
        )
    return out


class RollupStore:
    """Append/compact continuous-aggregate table at ``path``."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        keys: Sequence[str],
        val_cols: Sequence[str],
        bucket_seconds: int,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.val_cols = list(val_cols)
        self.bucket_seconds = bucket_seconds

    def upsert_rollup(
        self, increment: DataFrame, *, ts_col: str, batch_id: str
    ) -> None:
        """Aggregate the raw increment to states and append. Safe to
        re-run with the same ``batch_id`` (read-side dedup)."""
        state = rollup_state(
            increment,
            keys=self.keys,
            ts_col=ts_col,
            bucket_seconds=self.bucket_seconds,
            val_cols=self.val_cols,
            batch_id=batch_id,
        )
        state.write.mode("append").parquet(self.path)

    def read_rollup(self, *, finalize: bool = True) -> DataFrame:
        """Merged (optionally finalized) per-bucket stats. Dedup on
        (keys, bucket_ts, batch_id) first so replayed batches count
        once."""
        states = self.spark.read.parquet(self.path).dropDuplicates(
            [*self.keys, "bucket_ts", "batch_id"]
        )
        merged = merge_rollup_states(
            states, keys=self.keys, val_cols=self.val_cols
        )
        if not finalize:
            return merged
        return finalize_rollup(merged, val_cols=self.val_cols)

    def compact_rollup(self) -> None:
        """Collapse all batch states into one ``__compacted`` state per
        bucket. Staged write + swap (same local-FS caveats as
        ``sources.lake.compact_lake``: the swap window is not atomic on
        object stores)."""
        merged = self.read_rollup(finalize=False).withColumn(
            "batch_id", F.lit(COMPACTED_BATCH)
        )
        tmp = self.path.rstrip("/") + "__compact_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        jvm_fs_swap(self.spark, src=tmp, dst=self.path)


def jvm_fs_swap(spark: SparkSession, *, src: str, dst: str) -> None:
    """Replace ``dst`` with ``src`` via Hadoop-FS renames (delete old,
    rename new). Local-FS semantics; see ``compact_lake`` for the
    recovery discussion."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(dst).getFileSystem(conf)
    bak = Path(dst + "__pre_compact")
    if fs.exists(bak):
        fs.delete(bak, True)
    fs.rename(Path(dst), bak)
    fs.rename(Path(src), Path(dst))
    fs.delete(bak, True)
