#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (NOT part of the
library): run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this
script compares each result parquet against its DuckDB oracle —
columns sorted by name, rows sorted, exact + approx verdicts.
"""
import duckdb, json, sys, math, os, re


def canon_dtype(dt):
    """Canonical dtype label: integer/float widths collapse (value
    comparison already proves them equal), but tz-awareness and
    date-vs-datetime do NOT — the driver's schema gate distinguishes
    TIMESTAMP from TIMESTAMP_NTZ (the r10 q121 escape: values matched,
    declared type didn't, and this script used to pass it)."""
    s = str(dt)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    return re.sub(r"datetime64\[[a-z]+", "datetime64[", s)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL  {name}: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1
        continue
    gd = [canon_dtype(t) for t in got.dtypes]
    wd = [canon_dtype(t) for t in want.dtypes]
    if gd != wd:
        diffs = {c: (g, w) for c, g, w in zip(got.columns, gd, wd) if g != w}
        print(f"FAIL  {name}: dtypes differ {diffs}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
        fails += 1
        continue
    if len(got) > 0:
        key = lambda df: df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
        got = got.iloc[key(got).argsort().values].reset_index(drop=True)
        want = want.iloc[key(want).argsort().values].reset_index(drop=True)
    exact = True
    approx = True
    detail = ""
    for c in got.columns:
        a, b = got[c].values, want[c].values
        for i in range(len(a)):
            x, y = a[i], b[i]
            xnan = isinstance(x, float) and math.isnan(x)
            ynan = isinstance(y, float) and math.isnan(y)
            if xnan or ynan:
                same = xnan and ynan
            elif isinstance(x, float) or isinstance(y, float):
                same = x == y
                if not same and abs(float(x) - float(y)) > 1e-9 * max(1.0, abs(float(y))):
                    approx = False
            else:
                same = str(x) == str(y)
                if not same:
                    approx = False
            if not same:
                exact = False
                if not detail:
                    detail = f" first diff col={c} row={i}: {x!r} != {y!r}"
    if exact:
        print(f"OK    {name} ({len(got)} rows)")
    elif approx:
        print(f"NEAR  {name} ({len(got)} rows) — approx-equal only;{detail}")
        fails += 1
    else:
        print(f"FAIL  {name}:{detail}")
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} exact")
sys.exit(1 if fails else 0)
