#!/usr/bin/env python3
"""Measure the DuckDB-oracle side of every gate query — the reference-
equivalent single-node baseline the bench is compared against.

BASELINE.json publishes no timing numbers, so the "within 2x of
baseline" criterion was unfalsifiable; this makes it a measurement:
each oracle SQL (the same statements the correctness gate replays) is
timed in DuckDB over the same sf parquet tables on the same host, and
the per-query minima across passes land in BASELINE_MEASURED.json.
Bench reads that file and emits a computed vs_baseline ratio.

Usage: bench_baseline.py [sf_dir] [oracle_sql.json] [passes]
"""
import sys, json, glob, time

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
best = {}
errs = {}
for name in sorted(oracle):
    times = []
    for _ in range(max(1, passes)):
        t0 = time.monotonic()
        try:
            con.sql(oracle[name]).fetchall()
            times.append(time.monotonic() - t0)
        except Exception as e:
            errs[name] = str(e).split("\n")[0][:200]
            break
    if times:
        best[name] = round(min(times), 4)

total = round(sum(best.values()), 3)
out = {
    "engine": "duckdb",
    "version": duckdb.__version__,
    "sf": sf_dir,
    "passes": passes,
    "total_sec": total,
    "queries": best,
    "errors": errs,
    "note": "per-query MIN across passes; same oracle SQL the "
            "correctness gate replays, same parquet, same host",
    "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
with open("BASELINE_MEASURED.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({"total_sec": total, "n_queries": len(best),
                  "n_errors": len(errs)}))
for n, e in errs.items():
    print(f"ERR {n}: {e}", file=sys.stderr)
