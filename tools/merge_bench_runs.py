#!/usr/bin/env python3
"""Cross-run bench merge (round 13, r12 verdict ask #3): the committed
BENCH_LOCAL form is now the PER-QUERY MINIMUM across N independent
full-suite runs (fresh JVM each), so round-over-round comparisons
measure plans, not host state — the three same-code r12 runs spanned
297.7-348.9 s purely on suite position / JVM / page-cache effects.

Usage:
  python3 tools/merge_bench_runs.py OUT.json run1.json run2.json [...]

Each input is a Bench `target/bench_full.json`. The output carries the
same shape as a single-run artifact: per-query minima, section sums,
vs_baseline ratios recomputed against BASELINE_MEASURED.json with the
same tagging rules as Bench.scala (lifecycle/iterative memberships are
read from the per-run `sections` blocks, scan_real/scan_micro re-tagged
at the 80 ms oracle threshold), plus every run's env block.
"""
import json
import sys

out_path = sys.argv[1]
runs = [json.load(open(p)) for p in sys.argv[2:]]
assert len(runs) >= 2, "need at least 2 runs to merge"

names = sorted(set().union(*[set(r["queries"]) for r in runs]))
merged = {}
for n in names:
    vals = [r["queries"][n] for r in runs
            if n in r["queries"] and r["queries"][n] >= 0]
    merged[n] = min(vals) if vals else -1.0

# section membership from the runs (lifecycle/iterative are static
# code-level sets; scan tags re-derived from the baseline below)
section_of = {}
for r in runs:
    for n, s in r.get("sections", {}).items():
        if s in ("lifecycle", "iterative"):
            section_of[n] = s

try:
    base = json.load(open("BASELINE_MEASURED.json"))
    base_q = base.get("queries", base)
except Exception:
    base_q = {}


def tag(n):
    if n in section_of:
        return section_of[n]
    b = base_q.get(n)
    if b is None:
        return "scan"
    return "scan_real" if b >= 0.08 else "scan_micro"


total = sum(v for v in merged.values() if v >= 0)
sec_sums = {}
for n, v in merged.items():
    if v >= 0:
        sec_sums[tag(n)] = sec_sums.get(tag(n), 0.0) + v

ok = [n for n, v in merged.items() if v >= 0 and n in base_q]
b_total = sum(base_q[n] for n in ok)
s_total = sum(merged[n] for n in ok)
ratios = {}
if b_total > 0:
    # round-15 headline split, mirroring Bench.scala: `vs_baseline`
    # covers the WORK-COMPARABLE classes (everything but lifecycle,
    # whose oracles replay only the final query of a build soak); the
    # all-in ratio survives verbatim as `vs_baseline_all`.
    b_life = sum(base_q[n] for n in ok if tag(n) == "lifecycle")
    s_life = sum(merged[n] for n in ok if tag(n) == "lifecycle")
    ratios["baseline_total_sec"] = round(b_total - b_life, 3)
    ratios["baselined_spark_sec"] = round(s_total - s_life, 3)
    if b_total - b_life > 0:
        ratios["vs_baseline"] = round(
            (s_total - s_life) / (b_total - b_life), 3)
    ratios["baseline_all_sec"] = round(b_total, 3)
    ratios["all_spark_sec"] = round(s_total, 3)
    ratios["vs_baseline_all"] = round(s_total / b_total, 3)
    for sec in ("scan_real", "scan_micro", "lifecycle", "iterative"):
        bs = sum(base_q[n] for n in ok if tag(n) == sec)
        ss = sum(merged[n] for n in ok if tag(n) == sec)
        if bs > 0:
            ratios[f"baseline_{sec}_sec"] = round(bs, 3)
            ratios[f"vs_baseline_{sec}"] = round(ss / bs, 3)

artifact = {
    "metric": "total_min_of_runs",
    "value": round(total, 3),
    "unit": "sec",
    "n_runs": len(runs),
    "run_totals": [round(r.get("value", -1), 3) for r in runs],
    "queries": {n: round(v, 4) for n, v in merged.items()},
    "sections": {n: tag(n) for n in names},
    "lifecycle_sec": round(sec_sums.get("lifecycle", 0.0), 3),
    "iterative_sec": round(sec_sums.get("iterative", 0.0), 3),
    "scan_sec": round(sum(v for k, v in sec_sums.items()
                          if k.startswith("scan")), 3),
    **ratios,
    "sf": runs[0].get("sf"),
    "envs": [r.get("env") for r in runs],
}
json.dump(artifact, open(out_path, "w"), indent=1)
print(f"{out_path}: {len(names)} queries, min-of-{len(runs)} total "
      f"{total:.1f}s, vs_baseline {ratios.get('vs_baseline', 'n/a')}")
