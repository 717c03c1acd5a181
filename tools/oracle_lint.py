#!/usr/bin/env python3
"""Oracle output-type lint (SURVEY §6) — pre-commit / standalone form.

DuckDB types sum() over any integer as HUGEINT (int128); the driver's
hasher serializes int128 differently from int64, so a HUGEINT column
EMITTED by an oracle hash-mismatches even when the values exactly equal
Spark's int64 answer (this class cost 7/226 queries in round 8). DESCRIBE
sees only the emitted schema, so internal CTE/window aggregates — also
HUGEINT mid-query, e.g. a running `sum(cents) OVER ...` later consumed by
max() — are correctly ignored; a windowed aggregate SELECTed directly is
flagged like any other emitted column. Rule: CAST on EMIT.

Usage:
    sbt "runMain graft.OracleDump /tmp/oracle_sql.json"
    python3 tools/oracle_lint.py /tmp/oracle_sql.json [sfDir]
Exit 0 = clean, 2 = violations.
"""
import duckdb, sys, json

oracle_path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/oracle_sql.json'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.001'

BANNED = ('HUGEINT', 'UHUGEINT')

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(oracle_path))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        fails.append((name, f'describe error: {str(e)[:200]}'))
        continue
    for col, typ, *_ in desc:
        if any(b in typ.upper() for b in BANNED):
            fails.append(
                (name, f'column `{col}` is {typ}: wrap in CAST(... AS BIGINT)'))

if fails:
    print(f"ORACLE TYPE LINT: {len(fails)} violation(s) over {len(oracle)} oracles")
    for n, m in fails:
        print(f"LINT {n}: {m}")
    sys.exit(2)
print(f"ORACLE TYPE LINT: clean ({len(oracle)} oracles)")
