#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY §6).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/verify_local.py <sfDir> <outDir>

Loads each query's parquet output and its DuckDB oracle result, sorts
columns by name and rows by value, and compares EXACTLY (no float
tolerance — the engine is designed for bit-stable cross-engine results).
"""
import duckdb, sys, json, os
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = sys.argv[3].split(',') if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
passed, fails = [], []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    res_dir = f'{out}/{name}'
    if not os.path.isdir(res_dir):
        fails.append((name, 'missing spark output'))
        continue
    try:
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'exec error: {e}'))
        continue
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f'cols {list(got.columns)} vs {list(exp.columns)}'))
        continue
    if len(got) != len(exp):
        fails.append((name, f'rows {len(got)} vs {len(exp)}'))
        continue
    cols = list(got.columns)
    got = got.sort_values(by=cols, kind='mergesort').reset_index(drop=True)
    exp = exp.sort_values(by=cols, kind='mergesort').reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        passed.append(name)
    except AssertionError as e:
        msg = str(e).replace('\n', ' | ')[:300]
        fails.append((name, msg))

print(f"PASS {len(passed)}/{len(passed) + len(fails)}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
sys.exit(1 if fails else 0)
