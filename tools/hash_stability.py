#!/usr/bin/env python3
"""Cross-run bit-stability check for Verify output dirs (judge r15 #1).

Usage: hash_stability.py outDirA outDirB [outDirC ...]

For every query subdir present in ALL runs, reads the parquet, sorts
columns by name and rows by every column, canonicalizes values the way
the driver's hash effectively does (repr of python values — which
distinguishes -0.0 from 0.0, the exact flake class this exists to
catch), and compares the digest across runs. Exit 1 if any query's
digest differs between runs.
"""
import hashlib
import os
import sys

import duckdb


def digest(path: str) -> str:
    rel = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'")
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    rows = rel.fetchall()
    canon = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for r in canon:
        h.update(repr(r).encode())
    return h.hexdigest()


def main() -> int:
    dirs = sys.argv[1:]
    if len(dirs) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    queries = None
    for d in dirs:
        qs = {q for q in os.listdir(d)
              if os.path.isdir(os.path.join(d, q))}
        queries = qs if queries is None else queries & qs
    bad = []
    for q in sorted(queries):
        digests = [digest(os.path.join(d, q)) for d in dirs]
        if len(set(digests)) != 1:
            bad.append(q)
            print(f"UNSTABLE {q}: " + " ".join(x[:12] for x in digests))
    print(f"== {len(queries)} queries compared across {len(dirs)} runs, "
          f"{len(bad)} unstable")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
