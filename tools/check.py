#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each <outDir>/<name> parquet dump produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in sfDir, sorts columns by name, and compares row counts,
schemas (loosely), and values (exact for non-floats; floats must match to
1e-9 relative). Exit 0 iff every query matches.
"""
import json, math, sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        fail += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fail += 1
        continue
    bad = None
    for c in got.columns:
        g, e = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(g, e)):
            ok = True
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None or (isinstance(a, float) and math.isnan(a)) or (isinstance(b, float) and math.isnan(b)):
                    ok = (a is None or math.isnan(a)) == (b is None or math.isnan(b))
                else:
                    ok = a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
            else:
                ok = str(a) == str(b)
            if not ok:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: value mismatch col={c} row={i}: spark={a!r} duckdb={b!r}")
        fail += 1
    else:
        exact = "exact"
        print(f"OK   {name}: {len(got)} rows ({exact})")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
