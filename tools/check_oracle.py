#!/usr/bin/env python3
"""Dev harness mirroring the driver's correctness gate: run each oracle
SQL in DuckDB over the sf tables, load the Spark parquet result, sort
columns by name, and compare values exactly."""
import sys, json, glob, math
import duckdb
import pandas as pd

def isna(x):
    try:
        v = pd.isna(x)
        return bool(v) if not hasattr(v, "all") else False
    except Exception:
        return False

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
skipped = 0
import os
for name in sorted(oracle):
    # partial dev dumps (SPARK_GRAFT_VERIFY_ONLY): only check what's there
    if not os.path.isdir(f"{out_dir}/{name}"):
        skipped += 1
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}")
        fails += 1
        continue
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        fails += 1
        continue
    bad = None
    for c in want.columns:
        wv, gv = want[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(wv, gv)):
            if isna(a) or isna(b):
                if isna(a) and isna(b):
                    continue
                bad = (c, i, a, b); break
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    bad = (c, i, a, b); break
            elif isinstance(a, (list, tuple)) or "ndarray" in type(a).__name__:
                if list(a) != list(b):
                    bad = (c, i, a, b); break
            else:
                try:
                    eq = (a == b)
                    if hasattr(eq, "all"):
                        eq = bool(eq.all())
                except Exception:
                    eq = str(a) == str(b)
                if not eq:
                    bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: first diff col={c} row={i} oracle={a!r} spark={b!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(want)} rows")
checked = len(oracle) - skipped
note = f" ({skipped} not dumped, skipped)" if skipped else ""
print(f"\n{checked - fails}/{checked} oracles match{note}")
sys.exit(1 if fails else 0)
