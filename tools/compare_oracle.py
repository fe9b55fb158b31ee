#!/usr/bin/env python3
"""Dev-time mirror of the driver's DuckDB oracle gate (NOT part of the
engine): reads each Verify output parquet, runs the matching oracleSql in
DuckDB over the same testdata, and compares schema + values exactly.

Usage: compare_oracle.py [sf_dir] [verify_out]
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        s = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        o = con.sql(oracle[name]).df()

        # array-typed cells (numpy arrays / lists) are unhashable and break
        # sort_values — canonicalize them to nested tuples first
        def dearr(v):
            if isinstance(v, (np.ndarray, list, tuple)):
                return tuple(dearr(x) for x in v)
            return v
        def canon(df):
            df = df[sorted(df.columns)].copy()
            for c in df.columns:
                if df[c].dtype == object:
                    df[c] = df[c].map(dearr)
            return df.sort_values(by=list(df.columns), key=lambda col:
                col.map(repr) if col.dtype == object else col
            ).reset_index(drop=True)
        s, o = canon(s), canon(o)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            fails += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            fails += 1
            continue
        schema_note = ""
        if [str(d) for d in s.dtypes] != [str(d) for d in o.dtypes]:
            schema_note = f" [dtype diff: {list(zip(s.columns, s.dtypes, o.dtypes))}]"
        ok = True
        for c in s.columns:
            a, b = s[c].values, o[c].values
            if np.issubdtype(s[c].dtype, np.floating):
                eq = np.array_equal(a, b, equal_nan=True)  # bitwise-exact target
                if not eq:
                    md = np.nanmax(np.abs(a.astype(float) - b.astype(float))) if len(a) else 0
                    print(f"FAIL {name}: col {c} float mismatch, maxdiff={md:.3e}")
                    ok = False
            else:
                if not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all():
                    i = int(np.argmax(~(pd.Series(a).astype(str) == pd.Series(b).astype(str)).values))
                    print(f"FAIL {name}: col {c} mismatch at row {i}: {a[i]!r} vs {b[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name}: {len(s)} rows{schema_note}")
        else:
            fails += 1
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
