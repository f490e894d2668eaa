#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each <outDir>/<name> parquet dump produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in sfDir, sorts columns by name, and compares row counts,
schemas (loosely), pandas dtypes (an int64-vs-float64 divergence is how a
DuckDB HUGEINT sneaks past value compares but fails the driver's hash), and
values. Non-floats compare exactly; floats to 1e-9 relative, and any query
that needed the tolerance is labeled "(approx)" instead of "(exact)".
Null-ness and NaN-ness are compared separately (null != NaN).
Exit 0 iff every query matches.
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


def is_nan(x):
    return isinstance(x, float) and math.isnan(x)


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
    # Cross-family dtype divergence (int vs float) changes the hashed value
    # representation ("2" vs "2.0") and fails the driver even when every
    # value compares equal under tolerance — e.g. DuckDB windowed SUM
    # returns HUGEINT -> float64. Same-family width differences
    # (int32 vs int64) are normalized by the driver: warn only.
    def family(dt):
        s = str(dt)
        for f in ("int", "float", "bool", "datetime", "object"):
            if f in s:
                return f
        return s
    dtype_warn = []
    dtype_bad = None
    for c in got.columns:
        g, e = str(got[c].dtype), str(exp[c].dtype)
        if g != e:
            if family(g) == family(e):
                dtype_warn.append((c, g, e))
            else:
                dtype_bad = (c, g, e)
                break
    if dtype_bad:
        c, g, e = dtype_bad
        print(f"FAIL {name}: dtype family mismatch col={c}: spark={g} "
              f"duckdb={e} (driver hashes typed values; CAST the oracle)")
        fail += 1
        continue
    for c, g, e in dtype_warn:
        print(f"WARN {name}: dtype width col={c}: spark={g} duckdb={e}")
    bad = None
    approx = False
    for c in got.columns:
        g, e = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(g, e)):
            if isinstance(a, float) or isinstance(b, float):
                a_null, b_null = a is None, b is None
                if a_null or b_null:
                    ok = a_null == b_null
                elif is_nan(a) or is_nan(b):
                    ok = is_nan(a) == is_nan(b)
                elif a == b:
                    ok = True
                else:
                    ok = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                    approx = approx or ok
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
        label = "approx" if approx else "exact"
        print(f"OK   {name}: {len(got)} rows ({label})")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
