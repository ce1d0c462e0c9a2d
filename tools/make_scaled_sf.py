"""Generate an sf1-equivalent bench dataset by replicating sf0.1 with
key-shifted ids (r3 verdict #3).

Why replicate instead of duplicate: naive 10x row duplication creates
degenerate data (10 identical rows per (symbol, ts) — window ties,
everything an exact dup). Shifting every id/key column by
``replica * (max_key + 1)`` gives DISJOINT key spaces: 10x more
series/orders/docs over the same time range — the way market data
actually scales (more symbols, not longer history). Text/vector
payloads repeat verbatim across replicas, which mirrors the exact-dup
clusters of a real crawl corpus.

Output layout: ``<out>/sf1/<table>.parquet/part-*.parquet`` — each
table is a DIRECTORY of right-sized files so both engines get a
parallel scan (the driver's single-row-group files cap Spark at one
decode task, which is the very floor this dataset exists to amortize;
see ROUND4_NOTES). Physical types are preserved bit-for-bit by
round-tripping through pyarrow, so the schema-adaptive loaders behave
identically.

Usage: python tools/make_scaled_sf.py [--replicas 10]
       [--src /root/testdata/sf0.1] [--out /root/repo/testdata_scaled]
"""

from __future__ import annotations

import argparse
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id/FK columns to shift per table; referential pairs (orders.o_custkey
# -> customer.c_custkey etc.) shift by the PARENT's stride so FKs stay
# consistent across replicas
SHIFT_COLS: dict[str, list[tuple[str, str]]] = {
    # table -> [(column, stride_source_table.column)]
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer.c_custkey")],
    "supplier": [("s_suppkey", "supplier.s_suppkey")],
    "part": [("p_partkey", "part.p_partkey")],
    "orders": [("o_orderkey", "orders.o_orderkey"), ("o_custkey", "customer.c_custkey")],
    "lineitem": [
        ("l_orderkey", "orders.o_orderkey"),
        ("l_partkey", "part.p_partkey"),
        ("l_suppkey", "supplier.s_suppkey"),
    ],
    "events": [("event_id", "events.event_id"), ("user_id", "events.user_id")],
    "documents": [("doc_id", "documents.doc_id")],
    "embeddings": [("vec_id", "embeddings.vec_id")],
}

TARGET_FILE_MB = 4  # small files -> every core gets scan work


def _perturb_text(t: pa.Table, col: str, r: int) -> pa.Table:
    """Replica-salted token map (r6 verdict #4): each vocabulary token
    is deterministically either kept or suffixed with ``r{r}``
    (crc32(token|replica) — ~75% of the vocab salted per replica; the
    corpus vocabulary is tiny, so a 50% rate left some cross-replica
    shingle overlap above the 0.12 pair threshold).
    The map is INJECTIVE per replica and content-keyed, so every
    intra-replica dedup/similarity relation (exact-dup classes,
    shingle Jaccard, minhash bands) is preserved EXACTLY, while a
    cross-replica 3-gram shingle survives only when all three tokens
    stay unsalted in BOTH replicas (~(1/16)^3 — far below every pair
    threshold). Pair output therefore stays LINEAR in replicas, so
    the dedup/similarity families can be graded at sf10 instead of
    skipped for quadratic scaling artifacts."""
    field = t.schema.field(col)
    cache: dict[str, str] = {}

    def m(tok: str) -> str:
        got = cache.get(tok)
        if got is None:
            got = (
                f"{tok}r{r}"
                if zlib.crc32(f"{tok}|{r}".encode()) & 3
                else tok
            )
            cache[tok] = got
        return got

    out = [
        None if s is None else " ".join(m(w) for w in s.split(" "))
        for s in t[col].to_pylist()
    ]
    t = t.set_column(
        t.schema.get_field_index(col), field, pa.array(out, type=field.type)
    )
    if "n_chars" in t.schema.names:  # keep the derived length honest
        lens = pa.array(
            [None if s is None else len(s) for s in out],
            type=t.schema.field("n_chars").type,
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            t.schema.field("n_chars"), lens,
        )
    return t


def _perturb_embeddings(t: pa.Table, col: str, r: int) -> pa.Table:
    """Per-replica sign-flip mask over the embedding dimensions: each
    replica r>0 multiplies dimension d by a deterministic s_{r,d} in
    {+1,-1}. Intra-replica dot products (and norms) are preserved
    BIT-FOR-BIT — (s⊙v)·(s⊙w) = v·w — so every within-replica
    similarity relation survives; cross-replica cosine becomes a
    random-sign sum concentrated near 0, so verbatim replicas stop
    reading as near-duplicates and ANN/near-pair output stays linear
    in replicas."""
    field = t.schema.field(col)
    la = t[col].combine_chunks()
    offsets = np.asarray(la.offsets)
    widths = np.diff(offsets)
    valid = np.asarray(la.is_valid()) if la.null_count else None
    check = widths if valid is None else widths[valid]
    if len(check) == 0:
        return t
    # fail LOUDLY instead of silently skipping: unperturbed replicas
    # would reintroduce the cross-replica near-dup artifacts the
    # --perturb flag exists to remove
    if check.min() != check.max():
        raise ValueError(
            f"{col}: ragged embedding widths "
            f"({int(check.min())}..{int(check.max())}) — refusing to "
            "skip perturbation silently; make widths uniform or extend "
            "_perturb_embeddings with a per-row path"
        )
    dim = int(check[0])
    if valid is not None and (widths[~valid] % dim != 0).any():
        raise ValueError(
            f"{col}: null rows with extents not a multiple of dim={dim} "
            "would misalign the flat reshape"
        )
    # raw child values (NOT .flatten(): flatten drops null rows'
    # extents and would misalign against the offsets we reuse)
    if la.values.null_count:
        raise ValueError(f"{col}: null embedding elements unsupported")
    flat = np.asarray(la.values, dtype=np.float32)
    signs = (
        np.random.default_rng(1_000_003 * r)
        .integers(0, 2, dim)
        .astype(np.float32) * 2.0 - 1.0
    )
    flat = (flat.reshape(-1, dim) * signs).reshape(-1)
    # from_arrays drops the validity bitmap unless mask is passed
    mask = pa.array(~valid) if valid is not None else None
    new = pa.ListArray.from_arrays(
        la.offsets, pa.array(flat, type=field.type.value_type), mask=mask
    )
    return t.set_column(t.schema.get_field_index(col), field, new)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/testdata_scaled")
    ap.add_argument(
        "--name", default="sf1",
        help="output subdir; e.g. --replicas 30 --name sf3 for the "
             "sf3-equivalent tier",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables to generate (default: "
             "all); e.g. --tables lineitem for a flagship-only tier",
    )
    ap.add_argument(
        "--perturb", action="store_true",
        help="salt document tokens and sign-flip embeddings per "
             "replica (deterministic) so cross-replica dup/similarity "
             "artifacts disappear and the dedup/ANN families can be "
             "graded at scaled tiers",
    )
    args = ap.parse_args()

    out_dir = os.path.join(args.out, args.name)
    os.makedirs(out_dir, exist_ok=True)

    # strides: max+1 of every referenced key column, computed once
    strides: dict[str, int] = {}
    for ref in {r for cols in SHIFT_COLS.values() for _c, r in cols}:
        t, c = ref.split(".")
        col = pq.read_table(os.path.join(args.src, f"{t}.parquet"), columns=[c])[c]
        strides[ref] = int(pc.max(col).as_py()) + 1

    only = set(args.tables.split(",")) if args.tables else None
    for table, cols in SHIFT_COLS.items():
        if only is not None and table not in only:
            continue
        src = pq.read_table(os.path.join(args.src, f"{table}.parquet"))
        n_rep = 1 if not cols else args.replicas  # dims are not replicated
        parts = []
        for r in range(n_rep):
            t = src
            for col, ref in cols:
                if r == 0:
                    continue
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t[col], pa.scalar(r * strides[ref], type=t.schema.field(col).type))
                t = t.set_column(idx, t.schema.field(col), shifted)
            if args.perturb and r > 0:
                if table == "documents":
                    t = _perturb_text(t, "text", r)
                elif table == "embeddings":
                    t = _perturb_embeddings(t, "embedding", r)
            parts.append(t)
        full = pa.concat_tables(parts)

        dest = os.path.join(out_dir, f"{table}.parquet")
        shutil.rmtree(dest, ignore_errors=True)
        os.makedirs(dest)
        src_mb = os.path.getsize(os.path.join(args.src, f"{table}.parquet")) / 1e6
        # replicated tables get >=8 files regardless of byte size: CPU-
        # heavy scans (text shingling, vector math) need task fan-out
        # even when the bytes are tiny
        floor_files = 8 if n_rep > 1 else 1
        n_files = max(floor_files, min(32, round(src_mb * n_rep / TARGET_FILE_MB)))
        rows_per_file = -(-full.num_rows // n_files)
        for i in range(n_files):
            chunk = full.slice(i * rows_per_file, rows_per_file)
            if chunk.num_rows:
                pq.write_table(
                    chunk, os.path.join(dest, f"part-{i:03d}.parquet"),
                    compression="snappy",
                )
        print(f"{table}: {full.num_rows} rows, {n_files} files")


if __name__ == "__main__":
    main()
