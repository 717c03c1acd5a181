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

# --- Oracle output-type lint (SURVEY §6) -------------------------------
# DuckDB types sum(BIGINT) / sum(INTEGER) as HUGEINT (int128); the
# driver's hasher serializes int128 differently from int64, so any
# HUGEINT column EMITTED by an oracle hash-mismatches even when the
# values are exactly equal to Spark's int64.  DESCRIBE only sees the
# emitted schema, so internal window/CTE aggregates (which are also
# HUGEINT mid-query, e.g. a running `sum(cents) OVER ...` consumed by a
# later max()) are correctly ignored — only CAST on EMIT is required.
# The same applies to windowed aggregates that are selected directly.
BANNED_TYPES = ('HUGEINT', 'UHUGEINT')
lint_fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        lint_fails.append((name, f'describe error: {e}'))
        continue
    for col, typ, *_ in desc:
        if any(b in typ.upper() for b in BANNED_TYPES):
            lint_fails.append(
                (name, f'column `{col}` is {typ}: wrap in CAST(... AS BIGINT)'))
if lint_fails:
    print(f"ORACLE TYPE LINT: {len(lint_fails)} violation(s)")
    for n, m in lint_fails:
        print(f"LINT {n}: {m}")
    sys.exit(2)

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
    # Both frames come through DuckDB's fetchdf, so NULL-bearing integer
    # columns float-promote identically on both sides; after widening
    # int32→int64 (Spark INT vs DuckDB-inferred INTEGER is a legitimate
    # pair) any remaining dtype gap is a real physical-type divergence —
    # exactly the class check_dtype=False masked for three rounds.
    for df in (got, exp):
        for c in df.columns:
            if str(df[c].dtype) in ('int8', 'int16', 'int32',
                                    'uint8', 'uint16', 'uint32'):
                df[c] = df[c].astype('int64')
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
        passed.append(name)
    except AssertionError as e:
        msg = str(e).replace('\n', ' | ')[:300]
        fails.append((name, msg))

print(f"PASS {len(passed)}/{len(passed) + len(fails)}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
sys.exit(1 if fails else 0)
