"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir, compare row count, column set, and values
(exact-after-sort, with max-abs-diff reporting for floats).

Usage:
    python tools/oracle_check.py              # all queries at sf0.01
    python tools/oracle_check.py w09_ema ...  # subset
    SF_DIR=/root/testdata/sf0.001 python tools/oracle_check.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # Dtype-strict on purpose (matches the driver's gate): a
            # tz-aware column is NOT normalized to naive — it renders
            # with a +00:00 suffix and fails the value compare, exactly
            # like the driver's schema_match.  Oracle SQL must emit
            # naive TIMESTAMP (EPOCH_MS / MAKE_TIMESTAMP), never
            # TO_TIMESTAMP (TIMESTAMPTZ).
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                df[c] = dt.dt.tz_convert("UTC").astype("datetime64[us, UTC]")
            else:
                df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int widths / nullables
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _kind(dtype) -> str:
    """Coarse dtype class for the strict check.  The driver's value
    hash is dtype-sensitive across int/float (r10: DuckDB HUGEINT →
    pandas float64 vs Spark int64 failed the driver hash on identical
    values), so int-vs-float is a FAIL here even when values match."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if set(sdf.columns) != set(odf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count: spark={len(sdf)} oracle={len(odf)}"
    dtype_msgs = [
        f"{c}: dtype kind spark={_kind(sdf[c].dtype)}({sdf[c].dtype}) "
        f"oracle={_kind(odf[c].dtype)}({odf[c].dtype})"
        for c in sdf.columns
        if _kind(sdf[c].dtype) != _kind(odf[c].dtype)
    ]
    a, b = _norm(sdf), _norm(odf)
    msgs = list(dtype_msgs)
    ok = not dtype_msgs
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            x, y = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(x) & np.isnan(y)
            neq = ~both_nan & ~(x == y)
            if neq.any():
                with np.errstate(invalid="ignore"):
                    d = np.abs(x - y)
                nan_mismatch = int((np.isnan(x) != np.isnan(y)).sum())
                ok = False
                msgs.append(
                    f"{c}: {int(neq.sum())} diffs, max={np.nanmax(d[neq]):.3e}, nan_mismatch={nan_mismatch}"
                )
        else:
            neq = ~(a[c].astype(str) == b[c].astype(str))
            if neq.any():
                ok = False
                msgs.append(f"{c}: {int(neq.sum())} non-float diffs e.g. {a[c][neq].iloc[0]!r} vs {b[c][neq].iloc[0]!r}")
    return ok, "; ".join(msgs) if msgs else "exact"


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]

    # this tool IS the full local gate: always check the whole registry
    # regardless of the driver-panel rotation in __spark_entry__ — a
    # hard assignment, not setdefault, so an inherited rotate value
    # can't silently shrink the artifact to a third of the queries
    os.environ["SPARK_GRAFT_PANEL"] = "full"
    import __spark_entry__ as E
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    sqls = E.oracle_sql()
    todo = names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name in todo:
        if name not in qs:
            print(f"?? {name}: unknown query")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "msg": "spark error"}
            n_fail += 1
            continue
        if name not in sqls:
            dt = round(time.time() - t0, 1)
            print(f"rows {name}: {len(sdf)} rows (rows-only, {dt}s)")
            results[name] = {"status": "rows_only", "rows": len(sdf), "sec": dt}
            n_rows_only += 1
            continue
        try:
            odf = con.sql(sqls[name]).df()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            results[name] = {"status": "fail", "msg": "duckdb error"}
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        tag = "PASS" if ok else "FAIL"
        dt = round(time.time() - t0, 1)
        print(f"{tag} {name}: {len(sdf)} rows, {msg} ({dt}s)")
        results[name] = {
            "status": "pass" if ok else "fail", "rows": len(sdf),
            "msg": msg, "sec": dt,
        }
        n_pass += ok
        n_fail += not ok
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    # ORACLE_JSON=<path>: persist the full-registry gate as an artifact
    # (r6 verdict #7 — CORRECTNESS_LOCAL_r{N}.json per round)
    out = os.environ.get("ORACLE_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump({
                "sf_dir": sf_dir,
                "summary": {"pass": n_pass, "fail": n_fail,
                            "rows_only": n_rows_only},
                "queries": results,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
