#!/usr/bin/env python3
"""Local dev-loop replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]

Runs graft.Verify (Spark) into outdir, then executes each oracle SQL in
DuckDB over the same tables and compares: columns sorted by name, rows
sorted by all columns, exact value equality (NaN == NaN).
"""
import json
import subprocess
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            cwd="/root/repo", capture_output=True, text=True)
        err = [l for l in (r.stdout + r.stderr).splitlines()
               if "[verify]" in l or "[error]" in l]
        for l in err[:20]:
            print(l)
        if r.returncode != 0:
            print("VERIFY RUN FAILED"); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    import glob
    spark_queries = sorted(
        p.split("/")[-1] for p in glob.glob(f"{outdir}/q*") if "." not in p.split("/")[-1])

    n_pass = n_fail = 0
    for name in spark_queries:
        try:
            sdf = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"rows {name}: {len(sdf)} rows (no oracle)")
            if len(sdf) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, odf)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([q for q in spark_queries if q not in oracle])} rows-only")
    sys.exit(1 if n_fail else 0)


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(sdf, odf):
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver hashes values, so int-vs-float representation splits
        # (e.g. DuckDB HUGEINT -> pandas float64) fail there even when
        # values are equal. Mirror that strictness here.
        fa, fb = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        if fa != fb:
            return False, (f"column {c} dtype mismatch: spark={av.dtype} "
                           f"oracle={bv.dtype} (driver hash would differ)")
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                import numpy as np
                av = av.astype(float); bv = bv.astype(float)
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            else:
                av2 = av.astype(str); bv2 = bv.astype(str)
                neq = av2 != bv2
        except Exception as e:
            return False, f"column {c} compare error: {e}"
        if neq.any():
            i = neq.idxmax()
            return False, (f"column {c} differs at row {i}: "
                           f"spark={a[c][i]!r} oracle={b[c][i]!r} "
                           f"({int(neq.sum())} diffs)")
    return True, ""


if __name__ == "__main__":
    main()
