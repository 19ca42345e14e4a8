#!/usr/bin/env python3
"""Derive a larger scale factor from driver testdata for the SCALE
SWEEP ONLY (round-9 verdict ask #3: measure sf0.1 -> sf1 wall-time
exponents). The driver ships sf0.001/0.01/0.1; there is no generator
to rerun, so sf1 is REPLICATED 10x from sf0.1 with structure-preserving
perturbations chosen so the replica does NOT distort the swept
operators:

- relational tables: 10 copies with all join keys offset by
  copy * 10_000_000 -> ten disjoint sub-databases; every join
  cardinality and group-size distribution scales exactly linearly.
  region/nation stay fixed (dimensions).
- documents: copy 0 verbatim; copy i rotates each doc's word sequence
  by i/10 of its length. Token MULTISET (and so all frequency stats,
  BPE pair counts per word, token budgets) is preserved per copy,
  while md5 fingerprints, shingle sets, and minhash signatures all
  change -- replicas are NOT near-duplicates, so dedup candidate
  populations scale like a real 10x corpus instead of exploding
  quadratically inside replica groups.
- embeddings: copy 0 verbatim; copy i applies a seeded random
  ORTHOGONAL rotation (QR of a gaussian, det-corrected) -- norms and
  all WITHIN-copy pairwise similarities are exactly preserved, while
  cross-copy cosines behave like independent random directions
  (E[cos] ~ N(0, 1/dim)), again matching how a genuinely larger
  corpus behaves.
- events: 10 copies, ids offset, timestamps unchanged -> a 10x denser
  stream over the same window (how event volume actually grows).

Validation: the same derivation applied to sf0.01 produces sfd0.1;
benching the sweep list on NATIVE sf0.1 vs DERIVED sfd0.1 measures the
derivation bias directly (see SCALE_r10.json).

PERTURB mode (round 11, r10 verdict ask #3): word rotation preserves
token MULTISETS — and therefore token SETS — so set-similarity
operators (setSimilarityJoin, cosineSetJoin) see every replica as an
exact set TWIN: their true-pair population grows quadratically in the
copy count and the measured exponent reflects synthetic twins, not the
operator. With `perturb` as the 4th arg, each copy i > 0 additionally
replaces ~40%% of tokens with copy-tagged forms (deterministic
crc32(word:pos:copy) %% 100 < 40 -> "<word>x<i>q") AFTER the rotation:
cross-copy Jaccard drops to ~0.36/(2-0.36) = 0.22, far below the swept
taus (0.5-0.7), so derived copies are NOT set twins and the pair
population scales linearly like a real 10x corpus.

Usage: derive_sf.py <src_dir> <dst_dir> [copies=10] [perturb]
"""
import sys
import zlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfd1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
perturb = len(sys.argv) > 4 and sys.argv[4] == "perturb"
OFF = 10_000_000

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def replicate_sql(table, key_cols):
    reps = []
    for i in range(copies):
        sel = ", ".join(
            f"{c} + {i * OFF} AS {c}" if c in key_cols else c
            for c in cols[table])
        reps.append(f"SELECT {sel} FROM src_{table}")
    return " UNION ALL ".join(reps)


cols = {}
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"):
    con.sql(f"CREATE VIEW src_{t} AS SELECT * FROM "
            f"read_parquet('{src}/{t}.parquet')")
    cols[t] = [r[0] for r in con.sql(f"DESCRIBE src_{t}").fetchall()]

# fixed dimensions: copy through
for t in ("region", "nation"):
    con.sql(f"COPY (SELECT * FROM src_{t}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)")

keys = {
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
}
for t, k in keys.items():
    con.sql(f"COPY ({replicate_sql(t, k)}) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')"
                ).fetchone()[0]
    print(f"{t}: {n}")

# documents: word-rotate copies so replicas are not near-duplicates
docs = pq.read_table(f"{src}/documents.parquet").to_pylist()
out = []
for i in range(copies):
    for r in docs:
        row = dict(r)
        row["doc_id"] = r["doc_id"] + i * OFF
        if i > 0:
            words = r["text"].split()
            if len(words) > 1:
                rot = (i * len(words)) // copies
                words = words[rot:] + words[:rot]
            if perturb:
                words = [
                    f"{w}x{i}q"
                    if zlib.crc32(f"{w}:{j}:{i}".encode()) % 100 < 40
                    else w
                    for j, w in enumerate(words)]
            row["text"] = " ".join(words)
            row["n_chars"] = len(row["text"])
        out.append(row)
pq.write_table(pa.Table.from_pylist(out), f"{dst}/documents.parquet")
print(f"documents: {len(out)}")

# embeddings: per-copy seeded orthogonal rotation
tbl = pq.read_table(f"{src}/embeddings.parquet")
ids = np.array(tbl.column("vec_id"))
labels = np.array(tbl.column("label"))
vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
dim = vecs.shape[1]
all_ids, all_vecs, all_labels = [], [], []
for i in range(copies):
    if i == 0:
        v = vecs
    else:
        rng = np.random.default_rng(1000 + i)
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q *= np.sign(np.diag(r))  # unique orthogonal Q, det-corrected
        v = vecs @ q
    all_ids.append(ids + i * OFF)
    all_vecs.append(v.astype(np.float32))
    all_labels.append(labels)
emb = pa.Table.from_pydict({
    "vec_id": np.concatenate(all_ids),
    "embedding": pa.array(list(np.concatenate(all_vecs)),
                          type=pa.list_(pa.float32())),
    "label": np.concatenate(all_labels),
})
pq.write_table(emb, f"{dst}/embeddings.parquet")
print(f"embeddings: {emb.num_rows}")
print(f"derived {copies}x of {src} -> {dst}")
