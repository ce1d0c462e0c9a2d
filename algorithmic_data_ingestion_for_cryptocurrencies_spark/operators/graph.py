"""Iterative graph scoring beyond connected components
(:func:`.dedup.connected_components`): fixed-iteration PageRank for
link/interaction authority — the standard crawl-curation signal
(domain authority feeds quality weighting the way it does in
production web pipelines).

No counterpart in the reference; beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    plan_probe=None,
) -> DataFrame:
    """Power-iteration PageRank over an edge list, a FIXED number of
    rounds (rank ordering stabilizes in a handful of iterations; a
    fixed count keeps the computation deterministic and
    oracle-expressible). Returns (node, pagerank).

    Semantics: uniform start 1/N; each round
    ``pr(v) = (1-d)/N + d * sum_{u->v} pr(u) / outdeg(u)``.
    Dangling mass (nodes with no out-edges) is dropped, not
    redistributed — ranks then need no global renormalization pass
    per round, and relative ordering (the curation signal) is
    unaffected; document-level convention, mirrored by the oracle.

    Scale shape (Pregel-style stationary edges): the edge list is
    hash-partitioned by ``src`` ONCE and pinned as a compressed
    columnar cache (off the GC-churned object heap, unlike a
    deserialized localCheckpoint — the r8 sf30 run showed GCLocker
    stalls from |E|-sized pinned row blocks); every round then moves
    only O(N) rank rows INTO the stationary edge partitioning via a
    shuffle-hash join (the pre-r9 shape re-shuffled the |E|-row
    weighted edge list against the ranks every round, 3x 180M rows at
    sf30). Out-degrees fold into the rank side (N rows) instead of a
    second |E|-sized weighted-edge pin. The dst aggregate map-side
    combines to at most (distinct dst per partition) before its
    shuffle. Ranks stay ``localCheckpoint``-pinned per round so
    iteration k+1's plan does not nest k join trees; the only
    driver-side values are scalar counts.

    Lifecycle: the final ranks checkpoint is EAGER, so the iterations
    execute inside this call and the |E|-sized edge cache is
    unpersisted before returning (r9 ADVICE: a library caller looping
    pagerank in one session must not accumulate pinned edge blocks).
    The returned frame reads its own checkpointed partitions; the
    bounded intermediate checkpoints (N-row ranks/degrees) are
    reclaimed by the ContextCleaner once the frame is GC'd."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # materializes the nodes checkpoint (and e's cache)
    if n == 0:  # empty edge list: no nodes, not a ZeroDivisionError
        e.unpersist(blocking=False)
        return nodes.withColumn("pagerank", F.lit(0.0))
    # N rows; checkpointed so rounds do not re-aggregate the edge cache
    deg = (
        e.groupBy("src").agg(F.count("*").alias("__deg"))
        .localCheckpoint(eager=False)
    )

    # r14 optimization (guide §2.4 — remove joins/shuffles outright):
    # fold the out-degree into the rank frame ONCE before the loop, so
    # each round derives the per-edge mass by pure projection instead
    # of re-joining the N-row degree frame against the N-row ranks
    # (the pre-r14 shape paid one extra join — broadcast build at
    # small N, a 2-exchange sort-merge at sf30 N — per iteration).
    # Dangling nodes carry a NULL __deg and are filtered from the mass
    # projection, exactly as the old inner join dropped them; the
    # division and every downstream float op are unchanged, so ranks
    # are bit-identical.
    nodes_deg = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", "__deg")
        .localCheckpoint(eager=False)
    )
    ranks = nodes_deg.withColumn("pagerank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for it in range(iterations):
        # rank mass per out-edge, keyed by src: N rows, a pure
        # projection of the rank frame, shuffle-hashed into e's
        # partitioning (e side never moves; rd is always the bounded
        # build side)
        rd = ranks.filter(F.col("__deg").isNotNull()).select(
            F.col("node").alias("src"),
            (F.col("pagerank") / F.col("__deg")).alias("__w"),
        )
        contrib = (
            e.join(rd.hint("shuffle_hash"), "src")
            .select(F.col("dst").alias("node"), F.col("__w").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        next_ranks = nodes_deg.join(contrib, "node", "left").select(
            "node",
            "__deg",
            (F.lit(base)
             + damping * F.coalesce(F.col("__in"), F.lit(0.0))
             ).alias("pagerank"),
        )
        if plan_probe is not None:  # plan-shape tests: the returned
            plan_probe(next_ranks)  # frame is checkpoint-truncated
        # the LAST round checkpoints eagerly: the chain (lazy
        # intermediates included) materializes here, after which the
        # edge cache is no longer needed and is released below
        ranks = next_ranks.localCheckpoint(eager=(it == iterations - 1))
    # BLOCKING release (r14 sf30 ruling): the final checkpoint above
    # already materialized, so nothing reads e again — but with an
    # async unpersist the |E|-sized blocks linger into the CALLER's
    # next job and, back-to-back at sf30, measured as 1.7-1.9x
    # run-over-run degradation and one hard UNABLE_TO_ACQUIRE_MEMORY
    # in UnsafeExternalSorter once the execution pool hit zero. The
    # synchronous wait is milliseconds (local block drops), bounded by
    # block count, not data size.
    e.unpersist(blocking=True)
    # the carried degree column is loop plumbing, not part of the
    # contract; project it away above the final checkpoint
    return ranks.select("node", "pagerank")
