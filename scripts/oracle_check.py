#!/usr/bin/env python3
"""Dev-only local oracle check (mimics the driver's t2 gate).

Usage: python3 scripts/oracle_check.py <sf_dir> <verify_out_dir>
       python3 scripts/oracle_check.py --selftest

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB over views
on <sf_dir>/*.parquet, loads the Spark result parquet from
<verify_out_dir>/<name>/, sorts columns by name, and compares row-by-row
on CANONICAL RENDERED STRINGS (type-sensitive — an int64 197275 and a
float64/HUGEINT 197275.0 do NOT match, exactly like the driver's canonical
CSV hash). Two gates per query:

  1. TYPE gate: DuckDB `DESCRIBE <sql>` — every published oracle column
     must be in the closed portable type set (the oracle-side mirror of
     PublishedTypeSpec). HUGEINT / UHUGEINT / DECIMAL(p>18) are red.
  2. VALUE gate: arrow-to-arrow compare (no pandas float coercion; BIGINT
     with NULLs stays int64, never silently becomes float64).

NOT part of the shipped library (the Scala engine never depends on this).
--selftest runs a deliberately-HUGEINT query and asserts BOTH gates go red.
"""
import datetime
import glob
import math
import json
import os
import re
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Closed portable published-type set, oracle (DuckDB) side. Mirrors the
# Spark-side set enforced by PublishedTypeSpec: 64-bit-or-narrower ints,
# IEEE floats, strings, bools, dates/timestamps, binary, and LIST/STRUCT
# compositions thereof. HUGEINT (int128) and wide decimals are the class
# that hash-failed r13 q1/q4/q5/q9/q20/x119 and r14 x138.
_SCALAR_OK = {
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE", "BLOB",
}
_DEC_RE = re.compile(r"^DECIMAL\((\d+),\s*(\d+)\)$")


def type_ok(t):
    t = t.strip()
    if t in _SCALAR_OK:
        return True
    m = _DEC_RE.match(t)
    if m:
        return int(m.group(1)) <= 18
    if t.endswith("[]"):
        return type_ok(t[:-2])
    m = re.match(r"^(?:LIST|ARRAY)\((.*)\)$", t)
    if m:
        return type_ok(m.group(1))
    m = re.match(r"^MAP\((.*)\)$", t)
    if m:
        # split on top-level comma
        inner, depth, cut = m.group(1), 0, -1
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                cut = i
                break
        return cut > 0 and type_ok(inner[:cut]) and type_ok(inner[cut + 1:])
    m = re.match(r"^STRUCT\((.*)\)$", t)
    if m:
        inner, depth, start, parts = m.group(1), 0, 0, []
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(inner[start:i])
                start = i + 1
        parts.append(inner[start:])
        return all(type_ok(p.strip().split(" ", 1)[1]) for p in parts)
    return False


def render(v):
    """Canonical, type-sensitive cell render (the driver-hash mimic).

    int 5 -> '5'; float 5.0 -> '5.0' (so an int64 column vs a HUGEINT-
    promoted-to-float column MISMATCHES); NaN -> 'nan'; None -> '<null>';
    tz-aware timestamps normalized to naive UTC so Spark's UTC-adjusted
    parquet timestamps compare equal to DuckDB's naive TIMESTAMP.
    """
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{render(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render(x) for x in v) + "]"
    return str(v)


def canon_cols(tbl):
    return tbl.select(sorted(tbl.column_names))


def check_one(con, name, sql, out_dir):
    """Returns list of failure strings (empty = pass) + row count."""
    fails = []
    # gate 1: oracle published types
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception as e:
        return [f"duckdb describe error: {e}"], 0
    for col, typ, *_ in desc:
        if not type_ok(typ):
            fails.append(f"oracle published type gate: {col} is {typ} "
                         f"(outside closed portable set)")
    if fails:
        return fails, 0
    # gate 2: value compare (arrow both sides, no pandas coercion)
    try:
        duck = canon_cols(con.execute(sql).arrow())
    except Exception as e:
        return [f"duckdb error: {e}"], 0
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return ["no spark output"], 0
    sp = canon_cols(pq.read_table(files))
    if sp.column_names != duck.column_names:
        return [f"columns spark={sp.column_names} duck={duck.column_names}"], 0
    if sp.num_rows != duck.num_rows:
        return [f"rows spark={sp.num_rows} duck={duck.num_rows}"], 0
    for c in sp.column_names:
        a, b = sp.column(c).to_pylist(), duck.column(c).to_pylist()
        for i, (x, y) in enumerate(zip(a, b)):
            rx, ry = render(x), render(y)
            if rx != ry:
                return [f"row {i} col {c}: spark={rx} duck={ry}"], 0
    return [], sp.num_rows


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # multipart fixture mirror / ScaleFixture write tables as
        # DIRECTORIES of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    return con


def selftest():
    """A deliberately-HUGEINT oracle must go red in BOTH gates."""
    con = duckdb.connect()
    # gate 1: DESCRIBE flags HUGEINT
    desc = con.execute(
        "DESCRIBE SELECT SUM(x) AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).fetchall()
    assert desc[0][1] == "HUGEINT", desc
    assert not type_ok("HUGEINT"), "type gate failed to flag HUGEINT"
    assert not type_ok("DECIMAL(38,0)"), "type gate failed to flag wide dec"
    assert type_ok("DECIMAL(18,2)") and type_ok("BIGINT[]")
    assert type_ok("STRUCT(a BIGINT, b VARCHAR)")
    # gate 2: value render distinguishes int64 197275 from float 197275.0
    assert render(197275) != render(197275.0), "value gate float-coerces"
    # arrow path: HUGEINT arrives as decimal128 -> Decimal('197275');
    # render() canonicalizes it to the plain integer string, so the
    # DESCRIBE type gate above (not the value hash) is the HUGEINT
    # detector. Pin that contract.
    v = con.execute("SELECT SUM(x) AS s FROM (VALUES (197275::BIGINT)) t(x)"
                    ).arrow().column("s").to_pylist()[0]
    assert render(v) == "197275", f"decimal128 render drifted: {render(v)!r}"
    # NaN / null sanity
    assert render(float("nan")) == "nan" and render(None) == "<null>"
    print("SELFTEST PASS: HUGEINT red in type gate; "
          "int64-vs-float red in value gate")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        fails, nrows = check_one(con, name, oracle[name], out_dir)
        if fails:
            print(f"FAIL {name}: {fails[0]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({nrows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
