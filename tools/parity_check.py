#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and diffs values (columns sorted by name, rows sorted by all columns, floats
compared to 1e-9 relative)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); failures += 1; continue
        try:
            got = norm(con.execute(f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}"); failures += 1; continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
                ok = np.allclose(g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
                exact = np.array_equal(g.values, w.values)
                if not ok: bad = c; break
                if not exact:
                    print(f"[WARN] {name}.{c}: float equal@1e-9 but not bit-exact (hash may differ)")
            else:
                if not g.equals(w):
                    eq = (g == w) | (g.isna() & w.isna())
                    if not eq.all(): bad = c; break
        dtypes_differ = [c for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        if bad:
            print(f"[FAIL] {name}: column '{bad}' differs")
            m = (got[bad] != want[bad])
            print(pd.concat([got[m].head(3).add_suffix("_spark"), want[m].head(3).add_suffix("_oracle")], axis=1))
            failures += 1
        else:
            tag = f" (dtype diff: {dtypes_differ})" if dtypes_differ else ""
            print(f"[ OK ] {name}: {len(got)} rows{tag}")
    print(f"\n{len(oracle)} queries, {failures} failures")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
