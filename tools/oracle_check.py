#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [query ...]

Assumes `graft.Verify` already wrote <outDir>/<name>/ parquet results and
<outDir>/oracle_sql.json. For each query: run the oracle SQL in DuckDB over
views named after the testdata tables, load both sides, sort columns by
name, sort rows by all columns, and compare values exactly (floats must be
bit-close; NaN==NaN). Prints PASS/FAIL per query plus a diff head on FAIL.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Queries allowed to return 0 rows at the verification scale (NONE today:
# every registered query is non-empty at sf0.01 and sf0.001 — keep it
# that way; add a name here only with a comment saying WHY empty is the
# correct, verified answer).
EMPTY_BY_DESIGN: set = set()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # Dtype-strict: the driver's hash gate is dtype-sensitive (e.g. DuckDB
        # HUGEINT sums land as float64/object vs Spark's int64). Treat signed/
        # unsigned ints as one family; everything else must match in kind.
        # Int WIDTHS are deliberately collapsed: the driver's gate is
        # empirically family-wise — q32's n_chars_norm (Spark int32 vs DuckDB
        # int64) was hash-green in CORRECTNESS_r02, so int32-vs-int64 drift
        # cannot produce a driver failure this replica would miss.
        ak = "i" if av.dtype.kind in "iu" else av.dtype.kind
        bk = "i" if bv.dtype.kind in "iu" else bv.dtype.kind
        if ak != bk:
            return False, (f"col {c} dtype kind differs: spark={av.dtype} "
                           f"oracle={bv.dtype} (driver hash would fail)")
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
            else:
                ok = av.astype(str).equals(bv.astype(str))
        except Exception as e:
            return False, f"col {c}: compare error {e}"
        if not ok:
            mism = None
            try:
                if av.dtype.kind == "f":
                    diff = ~(np.isclose(av.astype(float), bv.astype(float),
                                        rtol=0, atol=0, equal_nan=True))
                else:
                    diff = av.astype(str) != bv.astype(str)
                idx = np.where(diff)[0][:3]
                mism = [(int(i), av.iloc[i], bv.iloc[i]) for i in idx]
            except Exception:
                pass
            return False, f"col {c} differs; first mismatches (row, spark, oracle): {mism}"
    return True, f"{len(a)} rows"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(name, spark_df, oracle_df)
        # Vacuity guard: a 0-row match on BOTH engines proves nothing — a
        # broken predicate/threshold also yields 0 rows and still "passes"
        # (q155's round-7 fate). Empty-by-design queries must be
        # whitelisted here explicitly.
        if ok and len(spark_df) == 0 and name not in EMPTY_BY_DESIGN:
            ok, msg = False, "VACUOUS: 0 rows on both engines (hash match proves nothing)"
        print(("PASS" if ok else "FAIL") + f" {name}: {msg}")
        n_pass += ok
        n_fail += not ok
    # rows-only checks for queries without an oracle
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"{'PASS' if n > 0 else 'FAIL'} {name}: rows-only check, {n} rows")
        n_pass += n > 0
        n_fail += n == 0
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
