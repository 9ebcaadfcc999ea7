#!/usr/bin/env python3
"""Dev-only local oracle check (mimics the driver's t2 gate).

Usage: python3 scripts/oracle_check.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB over views
on <sf_dir>/*.parquet, loads the Spark result parquet from
<verify_out_dir>/<name>/, sorts columns by name, and compares row-by-row.
NOT part of the shipped library (the Scala engine never depends on this).
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    if hasattr(a, "__len__") and not isinstance(a, str):
        if len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            duck = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sp = canon(pq.read_table(files).to_pandas())
        if list(sp.columns) != list(duck.columns):
            print(f"FAIL {name}: columns spark={list(sp.columns)} duck={list(duck.columns)}")
            n_fail += 1
            continue
        if len(sp) != len(duck):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(duck)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(sp)):
            for c in sp.columns:
                if not cell_eq(sp[c].iloc[i], duck[c].iloc[i]):
                    bad = (i, c, sp[c].iloc[i], duck[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
