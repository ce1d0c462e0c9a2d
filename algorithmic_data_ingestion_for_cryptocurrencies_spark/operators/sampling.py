"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines downsample
overrepresented strata (language, source, domain) and cap per-group
contributions. Doing that with ``rand()`` makes every rerun a
different dataset — a reproducibility bug at scale. These operators
derive the randomness from a **content hash of a stable id** (md5),
so the sample is a pure function of the data:

- identical across reruns, executors, and engines (the DuckDB oracle
  computes the very same md5 and agrees row-for-row);
- stable under repartitioning — no ``rand(seed)``-per-partition
  nondeterminism, no task-retry anomalies;
- shuffle-free for Bernoulli sampling (a plain filter that pushes
  into the scan) and one bounded window for per-group caps.

No counterpart in the reference (its datasets are small enough to
train on fully) — this is part of the beyond-reference LLM-pipeline
surface (BASELINE.md north-star).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _hash_hex8(id_col: str) -> F.Column:
    """First 8 hex chars of md5(id-as-string). Lowercase hex compares
    lexicographically == numerically, so ``hex8 < threshold_hex``
    selects a uniform fraction int(threshold,16)/16^8 of rows."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)


def rate_to_hex8(rate: float) -> str:
    """Render a sampling rate in [0, 1] as the 8-hex-char threshold
    whose lexicographic acceptance probability is ``rate`` (to within
    1/16^8 ≈ 2.3e-10)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(round(rate * 0xFFFFFFFF)), "08x")


def rate_to_threshold(rate: float) -> str:
    """Threshold literal for the ``hex8 < thr`` predicate. For
    ``rate >= 1.0`` returns ``'g'`` — lexicographically above every
    hex string — so 1.0 is *exactly* keep-all (``rate_to_hex8(1.0) ==
    'ffffffff'`` would drop rows whose md5 prefix is exactly ffffffff,
    p≈2.3e-10 per row: real rows at 100 TB scale; ADVICE r3). Oracle
    SQL renderings must use this same helper so both engines evaluate
    the identical predicate."""
    return "g" if rate >= 1.0 else rate_to_hex8(rate)


def hash_bernoulli_sample(
    df: DataFrame,
    *,
    id_col: str,
    rate: float | None = None,
    stratum_col: str | None = None,
    rates: Mapping[str, float] | None = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5(id) falls under the (per-stratum) rate.

    Pure narrow filter — no shuffle, no state, pushes down next to the
    scan; at 100 TB this is the only sampling shape that costs nothing
    beyond the read. Pass ``rate`` for a uniform sample or
    ``stratum_col`` + ``rates`` for per-stratum rates (e.g. language
    rebalancing: keep 10% of English, 100% of low-resource languages).
    """
    h = _hash_hex8(id_col)
    if rates is not None:
        if stratum_col is None:
            raise ValueError("rates requires stratum_col")
        thr = F.lit(rate_to_threshold(default_rate))
        # small literal CASE chain: strata sets are small by definition
        for value, r in sorted(rates.items()):
            thr = F.when(F.col(stratum_col) == value, F.lit(rate_to_threshold(r))).otherwise(thr)
    elif rate is not None:
        if rate >= 1.0:
            return df  # exactly keep-all, no filter at all
        thr = F.lit(rate_to_hex8(rate))
    else:
        raise ValueError("pass rate= or rates=")
    return df.filter(h < thr)


def with_shuffle_key(
    df: DataFrame, *, id_col: str, seed: str = "s0", out: str = "shuffle_key"
) -> DataFrame:
    """Attach a deterministic pseudo-random ordering key:
    ``md5(seed || ':' || id)``. Sorting by it is the reproducible
    version of 'shuffle the training set' — same order on every rerun
    and engine, different order per seed. Pure projection (no shuffle
    to *compute*; the eventual ``orderBy`` is Spark's sampled
    range-partitioned total sort, which scales)."""
    return df.withColumn(
        out, F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    )


def deterministic_shuffle(df: DataFrame, *, id_col: str, seed: str = "s0") -> DataFrame:
    """Total-order the frame by the seeded content hash."""
    return with_shuffle_key(df, id_col=id_col, seed=seed).orderBy("shuffle_key", id_col)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 256,
    seed: str = "s0",
) -> DataFrame:
    """Greedy first-fit-in-order packing of documents into fixed
    token-budget context windows (the 'sequence packing' step before
    LLM pretraining): returns the input ids plus ``(shard, bin)`` —
    the window each document lands in.

    Packing is inherently sequential, so it is SHARDED: documents are
    scattered to ``n_shards`` by id hash, each shard packs its own
    documents independently in seeded-hash order (deterministic across
    reruns and partitionings), and bins are namespaced by shard.
    Cross-shard packing quality is statistically identical to global
    packing once shards hold thousands of docs, and shards are the
    unit of parallelism — the one sequential pass is an Arrow-batched
    ``applyInPandas`` over a single shard's rows, never the corpus.
    Oversized documents (> budget) get a bin of their own rather than
    being dropped silently; chunk them upstream if that matters.

    Every hash in the operator is engine-portable (r11): the order key
    is the seeded md5 shuffle key, the shard is 4 hex nibbles of the
    SAME digest mod ``n_shards`` (uniform for ``n_shards <= 65536``;
    no second hash), and ties on the order key break by id — so the
    full output, greedy fold included, is reproducible in any engine
    with ``md5`` + a recursive CTE (the DuckDB oracle does exactly
    that).
    """
    import pandas as pd

    if n_shards > 65536:
        raise ValueError("n_shards must be <= 65536 (4-nibble shard hash)")

    schema = (
        f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
        f"{tokens_col} {df.schema[tokens_col].dataType.simpleString()}, "
        "shard int, bin bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__ord", id_col], kind="mergesort"
        ).reset_index(drop=True)
        bins, cur_bin, cur_tot = [], 0, 0
        for t in pdf[tokens_col].astype("int64"):
            if cur_tot > 0 and cur_tot + t > budget:
                cur_bin += 1
                cur_tot = 0
            cur_tot += int(t)
            bins.append(cur_bin)
        pdf = pdf.assign(bin=pd.Series(bins, dtype="int64"))
        return pdf[[id_col, tokens_col, "__shard", "bin"]].rename(
            columns={"__shard": "shard"}
        )

    staged = (
        with_shuffle_key(df, id_col=id_col, seed=seed, out="__ord")
        .withColumn(
            "__shard",
            F.pmod(
                F.conv(F.substring("__ord", 9, 4), 16, 10).cast("int"),
                F.lit(n_shards),
            ).cast("int"),
        )
        .select(id_col, tokens_col, "__shard", "__ord")
    )
    return staged.groupBy("__shard").applyInPandas(pack, schema=schema)


def hash_split(
    df: DataFrame,
    *,
    id_col: str,
    weights: Mapping[str, float],
    seed: str = "s0",
    group_col: str | None = None,
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the
    split whose cumulative md5-threshold range its hash falls in.
    Pure narrow projection — no shuffle, reproducible across reruns,
    engines, and repartitioning.

    ``group_col`` makes the split GROUP-AWARE: hashing the group key
    (source domain, URL host, near-dup cluster_id from
    :func:`..dedup.connected_components`) instead of the row id puts
    every member of a group in the same split — the standard guard
    against train/test leakage through near-duplicates.

    Weights must sum to ~1; the last split (in insertion order) takes
    the remainder range up to the keep-all sentinel, so coverage is
    exactly total.

    NULL keys: the key is coalesced to a sentinel before hashing, so
    NULL-key rows get a real (deterministic) split instead of falling
    through the when-chain unassigned, and a NULL group stays together
    as one group rather than scattering (r4 advice: md5(NULL) is NULL
    and every NULL comparison dropped such rows from every split)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = group_col or id_col
    key_str = F.coalesce(F.col(key).cast("string"), F.lit("\x00null"))
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key_str)), 1, 8)
    names = list(weights)
    cum = 0.0
    expr = None
    for i, name in enumerate(names):
        cum += weights[name]
        thr = "g" if i == len(names) - 1 else rate_to_threshold(cum)
        cond = h < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr)


def mixture_rates(
    df: DataFrame,
    *,
    stratum_col: str,
    tokens_col: str,
    target_shares: Mapping[str, float],
) -> DataFrame:
    """Per-stratum sampling rates that realize a target token mixture
    (the 'data mixing' step of corpus assembly: e.g. 40% en / 20% each
    de/fr/es by TOKENS, not documents).

    With downsampling only, the largest achievable corpus fixes the
    binding stratum at rate ~1.0: ``T* = min_s(tokens_s / share_s)``
    over the target strata, then ``rate_s = share_s * T* / tokens_s``.
    Strata absent from ``target_shares`` are excluded (rate row absent
    -> inner join in :func:`mixture_sample` drops them).

    Entirely inside the plan — one map-side-combined ``groupBy``
    (stratum grain, rows = #strata) and a single-row cross join for
    T*; no driver collect, no literal thresholds baked at build time.
    """
    share = F.lit(None).cast("double")
    for value, s in sorted(target_shares.items()):
        share = F.when(F.col(stratum_col) == value, F.lit(float(s))).otherwise(share)
    tok = df.groupBy(stratum_col).agg(
        F.sum(tokens_col).cast("double").alias("__tok")
    )
    rated = tok.withColumn("__share", share).filter(F.col("__share").isNotNull())
    tstar = rated.agg(F.min(F.col("__tok") / F.col("__share")).alias("__tstar"))
    return rated.crossJoin(F.broadcast(tstar)).select(
        stratum_col,
        ((F.col("__share") * F.col("__tstar")) / F.col("__tok")).alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    *,
    id_col: str,
    stratum_col: str,
    tokens_col: str,
    target_shares: Mapping[str, float],
) -> DataFrame:
    """Deterministic token-mixture sample: compute
    :func:`mixture_rates` from the data, then keep each row iff its
    md5(id) hex prefix falls under the stratum's rate threshold.

    The rate -> threshold rendering happens IN the plan (``'g'``
    keep-all sentinel at rate >= 1.0, else ``lpad(hex(floor(rate *
    2^32)))``; FLOOR, not round — IEEE-deterministic on every engine,
    no banker's-rounding knife edge), so an external engine computing
    the same rates reproduces the sample row-for-row. The rates frame
    is one row per *target* stratum — broadcast by construction; the
    inner join drops non-target strata and doubles as the filter
    pushdown point.
    """
    rates = mixture_rates(
        df, stratum_col=stratum_col, tokens_col=tokens_col,
        target_shares=target_shares,
    )
    thr = F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("rate") * F.lit(4294967296.0)))),
            8,
            "0",
        )
    )
    return (
        df.join(F.broadcast(rates.withColumn("__thr", thr)), stratum_col)
        .filter(_hash_hex8(id_col) < F.col("__thr"))
        .drop("rate", "__thr")
    )


def global_cumsum(
    df: DataFrame,
    *,
    val_col: str,
    order_cols: Sequence,
    out: str = "cum",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Global running sum in ``order_cols`` order WITHOUT a
    single-partition window — the scale-safe form of
    ``SUM(x) OVER (ORDER BY ...)``.

    Shape: range-repartition on the order (contiguous sorted ranges
    per partition), per-partition prefix sums (window partitioned by
    the physical partition id), then one tiny aggregate of
    per-partition totals (rows = #partitions, bounded) whose exclusive
    prefix — the only 'global window' left — runs over that bounded
    frame and broadcasts back. One wide shuffle + one broadcast join
    total; no stage ever sorts more than its partition.

    ``order_cols`` MUST be a total order (append a unique id): rows
    tying on a range boundary may land in either partition, and only a
    total order makes the cumulative sum independent of that (and of
    the sampled, run-varying boundaries themselves).
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = (
        df.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__incum", F.sum(val_col).over(w_in))
    # PIN the range-partitioned frame before branching (r4 advice):
    # the row-level prefix and the per-partition totals below both
    # consume this exchange, and RangePartitioning BOUNDARIES ARE
    # SAMPLED PER EXECUTION — correctness would otherwise ride on
    # ReuseExchange deduplicating the two branches (wrong sums with
    # spark.sql.exchange.reuse off, or any plan change that defeats
    # reuse). localCheckpoint materializes one partitioning that both
    # branches read (same pattern as dedup.connected_components).
    # ``pin=False`` exposes the raw two-branch plan for shape tests.
    if pin:
        d = d.localCheckpoint(eager=False)
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        d.groupBy("__pid")
        .agg(F.sum(val_col).alias("__ptot"))
        .withColumn("__off", F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(out, F.col("__incum") + F.col("__off"))
        .drop("__pid", "__incum")
    )


def take_token_budget(
    df: DataFrame,
    *,
    tokens_col: str,
    order_cols: Sequence,
    budget: int,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Budget-bounded corpus selection: walk the rows in
    ``order_cols`` order (quality-descending, or a seeded shuffle key
    for a random subset) and keep documents while the running token
    total stays within ``budget`` — the standard 'take the best N
    tokens' corpus cut. Built on :func:`global_cumsum`, so the global
    ordering never serializes through one task."""
    return global_cumsum(
        df, val_col=tokens_col, order_cols=order_cols, out=cum_col
    ).filter(F.col(cum_col) <= budget)


def hash_top_n_per_group(
    df: DataFrame,
    *,
    id_col: str,
    group_cols: Sequence[str],
    n: int,
) -> DataFrame:
    """Deterministic cap: at most ``n`` rows per group, chosen by
    md5(id) order (uniform among the group's rows, reproducible).

    One window shuffle on ``group_cols``; ties are impossible while
    md5 is collision-free on distinct ids, but ``id_col`` is appended
    to the ordering anyway so equal hashes cannot reorder across runs.
    For very hot groups at 100 TB scale, pre-thin with
    :func:`hash_bernoulli_sample` at a rate that leaves ~10n expected
    rows per group, then apply the exact cap — the window then sorts
    a bounded set instead of the full group."""
    w = Window.partitionBy(*group_cols).orderBy(
        _hash_hex8(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def fit_standardizer(
    df: DataFrame,
    *,
    cols: Sequence[str],
    keys: Sequence[str] = (),
) -> DataFrame:
    """FIT half of a leakage-correct feature scaler: per-``keys``
    (or global) mean and population std for each feature column,
    computed on the TRAINING slice only. The result is a tiny stats
    table (rows = key cardinality) meant to be persisted next to the
    model and broadcast at transform time — the fit/transform split
    is what keeps validation/test statistics out of the features
    (train-serving skew and leakage both die here).

    One map-side-combined aggregate; nothing else."""
    aggs = []
    for c in cols:
        aggs += [
            F.avg(c).alias(f"mean_{c}"),
            F.stddev_pop(c).alias(f"std_{c}"),
        ]
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def apply_standardizer(
    df: DataFrame,
    stats: DataFrame,
    *,
    cols: Sequence[str],
    keys: Sequence[str] = (),
    suffix: str = "_z",
) -> DataFrame:
    """TRANSFORM half: broadcast-join the fitted stats and emit
    ``(x - mean) / std`` per feature (NULL where the training slice
    had zero variance — surfaced, not silently passed through).
    Narrow after the broadcast; applies unchanged to train, val,
    test, and live serving."""
    keys = list(keys)
    joined = (
        df.join(F.broadcast(stats), keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    for c in cols:
        joined = joined.withColumn(
            f"{c}{suffix}",
            (F.col(c) - F.col(f"mean_{c}"))
            / F.nullif(F.col(f"std_{c}"), F.lit(0.0)),
        )
    return joined.drop(*[f"mean_{c}" for c in cols], *[f"std_{c}" for c in cols])


def with_time_fold(
    df: DataFrame,
    *,
    ts_col: str,
    n_folds: int,
    out: str = "fold_id",
) -> DataFrame:
    """Contiguous time-based CV folds: the [min, max] span splits into
    ``n_folds`` equal intervals and each row gets its interval index
    (1..n_folds; the max timestamp folds into the last). Time-ordered
    folds — NOT random — are the correct CV geometry for serially
    correlated data. The global min/max is a two-value aggregate
    broadcast back (no global window)."""
    bounds = df.agg(
        F.min(F.col(ts_col).cast("double")).alias("__lo"),
        F.max(F.col(ts_col).cast("double")).alias("__hi"),
    )
    t = F.col(ts_col).cast("double")
    span = F.col("__hi") - F.col("__lo")
    fold = F.least(
        F.lit(n_folds),
        (F.floor((t - F.col("__lo")) / F.nullif(span, F.lit(0.0)) * n_folds) + 1)
        .cast("int"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, F.coalesce(fold, F.lit(1)))
        .drop("__lo", "__hi")
    )


def purged_train_mask(
    df: DataFrame,
    *,
    ts_col: str,
    n_folds: int,
    val_fold: int,
    embargo_seconds: float = 0.0,
    fold_col: str = "fold_id",
    out: str = "is_train",
) -> DataFrame:
    """Purged walk-forward mask: rows in ``val_fold`` are validation;
    training excludes the validation interval PLUS an embargo margin
    on both sides, so serially-correlated features (rolling windows,
    labels looking ``horizon`` ahead) cannot leak across the boundary
    — the purged/embargoed CV construction from the financial-ML
    literature. Adds ``fold_id``, ``is_val``, and ``is_train``
    (embargo rows are neither)."""
    d = with_time_fold(df, ts_col=ts_col, n_folds=n_folds, out=fold_col)
    bounds = d.filter(F.col(fold_col) == val_fold).agg(
        F.min(F.col(ts_col).cast("double")).alias("__vlo"),
        F.max(F.col(ts_col).cast("double")).alias("__vhi"),
    )
    t = F.col(ts_col).cast("double")
    is_val = F.col(fold_col) == val_fold
    # coalesce to False: an EMPTY validation fold yields NULL bounds,
    # and a NULL embargo predicate must not silently void the whole
    # training set (every row stays trainable instead)
    in_embargo = F.coalesce(
        (t >= F.col("__vlo") - embargo_seconds)
        & (t <= F.col("__vhi") + embargo_seconds),
        F.lit(False),
    )
    return (
        d.crossJoin(F.broadcast(bounds))
        .withColumn("is_val", is_val)
        .withColumn(out, ~is_val & ~in_embargo)
        .drop("__vlo", "__vhi")
    )


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    *,
    col: str,
    n_bins: int = 10,
    keys: Sequence[str] = (),
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a baseline slice (training
    distribution) and a current slice (serving window) for one
    feature: equal-width bins over the BASELINE's [min, max], per-bin
    proportions on both sides, ``PSI = sum((p-q) * ln(p/q))`` with
    ``eps``-floored proportions (the standard drift monitor; rule of
    thumb: <0.1 stable, 0.1-0.25 shifting, >0.25 drifted).

    Bin edges come from the baseline ONLY (current-side values outside
    the baseline range clamp into the edge bins), so the monitor
    detects the current slice leaving the training distribution rather
    than silently re-binning around it. Shape: one two-value aggregate
    on the baseline (broadcast), one bin-grain aggregate per side, one
    bin join — everything map-side-combinable, output rows =
    ``|keys| x 1``."""
    keys = list(keys)
    bounds = baseline.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )

    def binned(df: DataFrame, side: str) -> DataFrame:
        t = F.col(col).cast("double")
        span = F.nullif(F.col("__hi") - F.col("__lo"), F.lit(0.0))
        b = F.least(
            F.lit(n_bins),
            F.greatest(
                F.lit(1),
                (F.floor((t - F.col("__lo")) / span * n_bins) + 1).cast("int"),
            ),
        )
        return (
            df.crossJoin(F.broadcast(bounds))
            .withColumn("__bin", F.coalesce(b, F.lit(1)))
            .groupBy(*keys, "__bin")
            .agg(F.count("*").alias(f"__n_{side}"))
        )

    base = binned(baseline, "base")
    cur = binned(current, "cur")
    joined = base.join(cur, [*keys, "__bin"], "full_outer").fillna(
        {"__n_base": 0, "__n_cur": 0}
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    p = F.greatest(F.col("__n_base") / F.sum("__n_base").over(w), F.lit(eps))
    q = F.greatest(F.col("__n_cur") / F.sum("__n_cur").over(w), F.lit(eps))
    term = (p - q) * F.log(p / q)
    return (
        joined.withColumn("__term", term)
        .groupBy(*keys)
        .agg(F.sum("__term").alias("psi"), F.count("*").alias("n_bins_hit"))
    )
