#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB (bare table names resolved
as views over <sfDir>/*.parquet), sorts columns by name, and compares shape,
dtypes and values exactly. Dev-only tool — not part of the library.
"""
import sys, json, math, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no output parquet")
                n_fail += 1
                continue
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
            errs = compare(got, exp)
            if errs:
                print(f"FAIL {name}: {errs}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def compare(got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return f"columns differ: got {sorted(got.columns)} vs oracle {sorted(exp.columns)}"
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if len(got) != len(exp):
        return f"row count differs: got {len(got)} vs oracle {len(exp)}"
    errs = []
    for c in got.columns:
        gd, ed = str(got[c].dtype), str(exp[c].dtype)
        if gd != ed:
            errs.append(f"dtype[{c}]: got {gd} vs oracle {ed}")
        g, e = got[c], exp[c]
        if gd.startswith("float") or ed.startswith("float"):
            neq = ~((g == e) | (g.isna() & e.isna()))
        else:
            neq = ~((g.astype(object) == e.astype(object)) | (g.isna() & e.isna()))
        if neq.any():
            i = int(neq.idxmax())
            errs.append(f"values[{c}]: {int(neq.sum())} rows differ, first at row {i}: "
                        f"got {got[c][i]!r} vs oracle {exp[c][i]!r}")
    return "; ".join(errs)

if __name__ == "__main__":
    main()
