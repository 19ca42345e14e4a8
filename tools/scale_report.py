#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from the four sweep bench artifacts
(tools/derive_sf.py + graft.Bench with SPARK_GRAFT_BENCH_ONLY):

  /tmp/scale_sf0.01.json   native sf0.01
  /tmp/scale_sf0.1.json    native sf0.1
  /tmp/scale_sfd0.1.json   DERIVED 10x of sf0.01 (derivation validation)
  /tmp/scale_sfd1.json     DERIVED 10x of sf0.1 (the sf1 point)

Per query: wall seconds at each point, the measured scaling exponent
alpha_hi = log10(t_sfd1 / t_sf0.1) (the sf0.1 -> sf1 decade), the
lower-decade exponent alpha_lo = log10(t_sf0.1 / t_sf0.01), and the
derivation bias factor t_sfd0.1 / t_sf0.1 (same nominal scale, derived
vs native data; embeddings-heavy queries carry a known 2.5x row-count
bias — the driver scales embeddings 4x per decade, the derivation 10x).

Usage: scale_report.py <round_tag>   (e.g. r10)
"""
import json
import math
import sys

tag = sys.argv[1] if len(sys.argv) > 1 else "r10"


def load(p):
    d = json.loads(open(p).read())
    return d["queries"]


t001 = load("/tmp/scale_sf0.01.json")
t01 = load("/tmp/scale_sf0.1.json")
td01 = load("/tmp/scale_sfd0.1.json")
td1 = load("/tmp/scale_sfd1.json")

names = sorted(t01)
rows = {}
for n in names:
    a, b, c, d = t001.get(n, -1), t01.get(n, -1), td01.get(n, -1), td1.get(n, -1)
    if min(a, b, c, d) <= 0:
        continue
    rows[n] = {
        "sf0.01_sec": round(a, 3),
        "sf0.1_sec": round(b, 3),
        "sfd0.1_sec": round(c, 3),
        "sfd1_sec": round(d, 3),
        "alpha_lo": round(math.log10(b / a), 3),
        "alpha_hi": round(math.log10(d / b), 3),
        "derivation_bias": round(c / b, 3),
    }

out = {
    "metric": "scale_exponents",
    "round": tag,
    "decades": ["sf0.01->sf0.1 (native)", "sf0.1->sfd1 (derived 10x)"],
    "queries": rows,
    "totals": {
        "sf0.01_sec": round(sum(r["sf0.01_sec"] for r in rows.values()), 2),
        "sf0.1_sec": round(sum(r["sf0.1_sec"] for r in rows.values()), 2),
        "sfd0.1_sec": round(sum(r["sfd0.1_sec"] for r in rows.values()), 2),
        "sfd1_sec": round(sum(r["sfd1_sec"] for r in rows.values()), 2),
    },
}
path = f"SCALE_{tag}.json"
open(path, "w").write(json.dumps(out, indent=1))
print(json.dumps(out["totals"]))
w = max(len(n) for n in rows)
print(f"{'query'.ljust(w)}  sf0.01   sf0.1  sfd0.1    sfd1  a_lo  a_hi  bias")
for n, r in sorted(rows.items(), key=lambda kv: -kv[1]["alpha_hi"]):
    print(f"{n.ljust(w)} {r['sf0.01_sec']:7.2f} {r['sf0.1_sec']:7.2f} "
          f"{r['sfd0.1_sec']:7.2f} {r['sfd1_sec']:7.2f} "
          f"{r['alpha_lo']:5.2f} {r['alpha_hi']:5.2f} {r['derivation_bias']:5.2f}")
print(f"wrote {path}")
