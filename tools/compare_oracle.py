#!/usr/bin/env python3
"""Dev-time mirror of the driver's DuckDB oracle gate (NOT part of the
engine): reads each Verify output parquet, runs the matching oracleSql in
DuckDB over the same testdata, and compares schema + values exactly —
columns sorted by name, rows sorted by all values, the driver's compare
semantics.

Also the sf1 spot-check comparator: pass the MakeSf1 output dir as sf_dir
(directory-shaped parquet tables are handled) and a comma-separated name
filter to check just the heavyweight set.

Values compare at double precision: DECIMAL results normalize through
float first, because one engine may surface DECIMAL where the other
already cast to double, and the queries' contract is exactness of the
double the user reads (see OracleSql.decSum's VARCHAR route for why the
doubles themselves are bit-exact at any magnitude).

Usage: compare_oracle.py [sf_dir] [verify_out] [name,name,...]
Exit 0 iff every compared query matches rows + schema + values.
"""
import sys, os, json, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical value form shared by both engines' results."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, Decimal):
        return canon(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # collapse -0.0 / +0.0
            return repr(0.0)
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    # Tag remaining values with their Python type so cross-type
    # coincidences (BIGINT 5 vs VARCHAR '5', bool True vs str 'True')
    # cannot pass — an engine type regression with identical rendered
    # values must still mismatch. Both sides come through DuckDB, so
    # equal logical types yield equal Python types.
    return f"{type(v).__name__}:{v}"


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    canon_rows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return cols_sorted, canon_rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    # private spill dir: parallel comparator processes sharing the
    # default .tmp corrupt each other's temp storage
    tmp = f"/tmp/duckdb_spill_{os.getpid()}"
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    failures = 0
    names = [n for n in sorted(oracle) if only is None or n in only]
    for name in names:
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            # a query that threw in Verify leaves no output — that is a
            # failure of the gate, never a silent skip
            print(f"FAIL  {name}: no spark output")
            failures += 1
            continue
        try:
            scols, srows = frame(
                con, f"SELECT * FROM '{spark_path}/*.parquet'")
            ocols, orows = frame(con, oracle[name])
        except Exception as e:
            print(f"FAIL  {name}: error {e}")
            failures += 1
            continue
        if scols != ocols:
            print(f"FAIL  {name}: schema {scols} != {ocols}")
            failures += 1
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rows {len(srows)} != {len(orows)}")
            failures += 1
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows))
                       if a != b)
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:\n"
                  f"  spark : {srows[bad]}\n  oracle: {orows[bad]}")
            failures += 1
        else:
            print(f"PASS  {name}  ({len(srows)} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}"
          f" ({len(names) - failures}/{len(names)})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
