#!/usr/bin/env python3
"""Partitioning-independence audit.

Every verify query claims its result is a pure function of the input —
independent of partition count, shuffle layout, and task scheduling
(the determinism rules in SURVEY.md: exact decimal sums, full-key
ORDER BY, rank tie-breaks, sorted collects). This script checks the
claim empirically: dump Verify twice with DIFFERENT core counts, then
compare every query's parquet output value-by-value (stringified, so
an int64/float64 drift also fails).

Usage:
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/verify_out"
  SPARK_GRAFT_CPUS=3 sbt "runMain graft.Verify <sfDir> /tmp/verify_out3"
  python3 tools/partcheck.py /tmp/verify_out /tmp/verify_out3

Exit 0 iff no query diverges.
"""
import math
import os
import sys

import duckdb

A = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
B = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out3"

con = duckdb.connect()
dirs = sorted(d for d in os.listdir(A) if os.path.isdir(os.path.join(A, d)))
only_b = sorted(d for d in os.listdir(B)
                if os.path.isdir(os.path.join(B, d)) and d not in dirs)
bad = [(n, "present only in B") for n in only_b]
for name in dirs:
    # a dump missing on one side (Verify deletes a failing query's stale
    # dump, so a one-sided failure shows up as absence) must be REPORTED
    # as a divergence, not crash the audit mid-list
    try:
        a = con.execute(f"SELECT * FROM read_parquet('{A}/{name}/*.parquet')").fetchdf()
        b = con.execute(f"SELECT * FROM read_parquet('{B}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        bad.append((name, f"read error: {e}"))
        continue
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        bad.append((name, "shape mismatch"))
        continue
    for c in a.columns:
        diverged = False
        for x, y in zip(a[c].tolist(), b[c].tolist()):
            if x is None and y is None:
                continue
            if (isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y)):
                continue
            if str(x) != str(y):
                bad.append((name, f"col={c}: {x!r} vs {y!r}"))
                diverged = True
                break
        if diverged:
            break

print(f"{len(dirs)} queries compared; {len(bad)} partitioning-dependent")
for n, why in bad:
    print(f"DIVERGES {n}: {why}")
sys.exit(1 if bad else 0)
