#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Dev-only tool (runs on the driver-side python stack; the engine itself is
pure Scala/Spark). Usage:

    python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet, and
compares schema + values (columns sorted by name, rows sorted, values
hashed after light normalization).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        ok_schema = list(g.columns) == list(e.columns) and [str(t) for t in g.dtypes] == [str(t) for t in e.dtypes]
        ok_rows = len(g) == len(e)
        ok_vals = ok_schema and ok_rows and g.equals(e)
        if not ok_vals and ok_schema and ok_rows:
            # tolerate float noise explicitly so we see if it's ONLY that
            try:
                pd.testing.assert_frame_equal(g, e, check_exact=False, rtol=1e-12, atol=1e-12)
                ok_vals = "float-noise-only"
            except Exception:
                pass
        if ok_vals is True:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        elif ok_vals == "float-noise-only":
            print(f"WARN {name}: exact hash would FAIL, equal within 1e-12 (round harder!)")
            n_fail += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: schema_ok={ok_schema} rows {len(g)} vs {len(e)}")
            if not ok_schema:
                print(f"  spark: {[(c, str(t)) for c, t in zip(g.columns, g.dtypes)]}")
                print(f"  duckdb: {[(c, str(t)) for c, t in zip(e.columns, e.dtypes)]}")
            if ok_schema and ok_rows:
                neq = (g != e) & ~(g.isna() & e.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"  differing cols: {bad_cols}")
                for c in bad_cols[:3]:
                    idx = neq[c].idxmax()
                    print(f"    {c}[{idx}]: spark={g[c][idx]!r} duckdb={e[c][idx]!r}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
