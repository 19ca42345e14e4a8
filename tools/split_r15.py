#!/usr/bin/env python3
"""Round-15 registry split (r14 verdict ask #6): the next pair on the
growth watch. GatesSimilarity (1,584) loses the retrieval-ladder gates
(late interaction, MMR, PLAID MaxSim, ColBERT candidates, retrieval
metrics) to a new GatesRetrieval.scala — where the round-15 graph
late-interaction and NDCG gates will land; GatesDedup (1,628) loses
the coded/persisted vector-store block (SQ8/BQ ADC, IVF+SQ8 store
lifecycle, graph store search/index, embedding-store semantic/drift)
to a new GatesVectorStore.scala. Same lexer as split_entry.py /
split_r14.py (strings, interpolations, comments tracked exactly),
zero behavior change: entries are byte-identical, SparkEntry gains one
concatenation term per new file.
"""
import re

SIM = "src/main/scala/graft/entry/GatesSimilarity.scala"
RET = "src/main/scala/graft/entry/GatesRetrieval.scala"
DEDUP = "src/main/scala/graft/entry/GatesDedup.scala"
VSTORE = "src/main/scala/graft/entry/GatesVectorStore.scala"
ENTRY = "src/main/scala/graft/SparkEntry.scala"


def scan_entries(text, start_idx):
    i = start_idx
    assert text[i] == "("
    depth = 1
    i += 1
    entries = []
    cur = []

    def flush():
        nonlocal cur
        chunk = "".join(cur).strip()
        if chunk.strip(", \n"):
            entries.append(chunk.rstrip().rstrip(","))
        cur = []

    n = len(text)
    while i < n and depth > 0:
        c = text[i]
        two = text[i:i + 2]
        three = text[i:i + 3]
        if two == "//":
            j = text.find("\n", i)
            cur.append(text[i:j])
            i = j
            continue
        if two == "/*":
            j = text.find("*/", i) + 2
            cur.append(text[i:j])
            i = j
            continue
        if three == '"""':
            j = i + 3
            while text[j:j + 3] != '"""' or text[j + 3:j + 4] == '"':
                j += 1
            j += 3
            while text[j] == '"':
                j += 1
            cur.append(text[i:j])
            i = j
            continue
        if c == '"':
            j = i + 1
            while text[j] != '"':
                if text[j] == "\\":
                    j += 1
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if c == "'":
            if text[i + 1] == "\\":
                cur.append(text[i:i + 4])
                i += 4
                continue
            if text[i + 2] == "'":
                cur.append(text[i:i + 3])
                i += 3
                continue
            cur.append(c)
            i += 1
            continue
        if c in "({[":
            depth += 1
            cur.append(c)
            i += 1
            continue
        if c in ")}]":
            depth -= 1
            if depth == 0:
                flush()
                return entries, i
            cur.append(c)
            i += 1
            continue
        if c == "," and depth == 1:
            cur.append(c)
            flush()
            i += 1
            continue
        cur.append(c)
        i += 1
    raise RuntimeError("unbalanced")


def name_of(entry):
    m = re.search(r'"(q[0-9]+[a-z0-9_]*)"\s*->', entry)
    if not m:
        raise RuntimeError("entry without name: " + entry[:120])
    return m.group(1)


def split_file(src, dst, dst_obj, move_pred, src_doc, dst_doc):
    text = open(src).read()

    def find_map_open(anchor):
        k = text.find(anchor)
        assert k >= 0, anchor
        p = text.find("Map(", k)
        return p + 3

    q_open = find_map_open(
        "val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    q_entries, _ = scan_entries(text, q_open)
    o_open = find_map_open("val oracles: Map[String, String] = Map(")
    o_entries, _ = scan_entries(text, o_open)

    kept_q = [e for e in q_entries if not move_pred(name_of(e))]
    moved_q = [e for e in q_entries if move_pred(name_of(e))]
    kept_o = [e for e in o_entries if not move_pred(name_of(e))]
    moved_o = [e for e in o_entries if move_pred(name_of(e))]
    assert {name_of(e) for e in moved_q} == {name_of(e) for e in moved_o}, (
        sorted({name_of(e) for e in moved_q} ^ {name_of(e) for e in moved_o}))
    print(f"{src}: keep {len(kept_q)} gates, move {len(moved_q)} gates")

    header = text[:text.index("/** Gate registry")]
    src_obj = re.search(r"private\[graft\] object (\w+)", text).group(1)

    def emit(path, obj, doc, qs, os_):
        body = (header + doc + f"private[graft] object {obj} {{\n\n"
                + "  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n\n"
                + ",\n\n".join(qs)
                + ")\n\n  val oracles: Map[String, String] = Map(\n\n"
                + ",\n\n".join(os_) + ")\n}\n")
        open(path, "w").write(body)

    emit(src, src_obj, src_doc, kept_q, kept_o)
    emit(dst, dst_obj, dst_doc, moved_q, moved_o)
    return dst_obj


RETRIEVAL_SET = {
    "q348_late_interaction", "q349_mmr_select", "q354_plaid_maxsim",
    "q355_retrieval_metrics", "q356_colbert_candidates",
}

split_file(
    SIM, RET, "GatesRetrieval",
    lambda n: n in RETRIEVAL_SET,
    """/** Gate registry, ANN / similarity search (brute force, IVF ladder, graph, PQ) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8). Round 15: the
  * retrieval-ladder gates (late interaction, MMR, PLAID MaxSim,
  * ColBERT candidates, retrieval eval metrics) moved verbatim to
  * [[GatesRetrieval]] (registry growth watch: Similarity was at
  * 1,584 lines; zero behavior change).
  */
""",
    """/** Gate registry, the retrieval ladder (ColBERT-style late
  * interaction, PLAID MaxSim composition, token-level candidates,
  * MMR diversity, ranked-retrieval eval metrics) — moved verbatim
  * out of GatesSimilarity at round 15 (registry growth watch; zero
  * behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
""")


VSTORE_SET = {
    "q84_sq8_adc", "q300_bq_hamming", "q90_ivfsq8_persisted",
    "q357_ivfsq8_filtered", "q351_ivfsq8_delete_compact",
    "q325_graph_search", "q326_graph_index",
    "q113_store_semantic", "q114_centroid_drift",
}

split_file(
    DEDUP, VSTORE, "GatesVectorStore",
    lambda n: n in VSTORE_SET,
    """/** Gate registry, the dedup family (exact, MinHash/LSH, SimHash, semantic, spans) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8). Round 15: the
  * coded/persisted vector-store gates (SQ8/BQ ADC, IVF+SQ8 store
  * lifecycle, graph store search/index, embedding-store
  * semantic/drift) moved verbatim to [[GatesVectorStore]] (registry
  * growth watch: Dedup was at 1,628 lines; zero behavior change).
  */
""",
    """/** Gate registry, coded / persisted vector stores (SQ8 + binary
  * ADC, the IVF+SQ8 on-disk lifecycle incl. filtered and
  * delete/compact paths, graph store search and index dumps,
  * embedding-store semantic probes and centroid drift) — moved
  * verbatim out of GatesDedup at round 15 (registry growth watch;
  * zero behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
""")

entry = open(ENTRY).read()
for anchor, add in [
    ("graft.entry.GatesSimilarity.queries ++",
     "graft.entry.GatesRetrieval.queries ++"),
    ("graft.entry.GatesSimilarity.oracles ++",
     "graft.entry.GatesRetrieval.oracles ++"),
    ("graft.entry.GatesDedup.queries ++",
     "graft.entry.GatesVectorStore.queries ++"),
    ("graft.entry.GatesDedup.oracles ++",
     "graft.entry.GatesVectorStore.oracles ++"),
]:
    assert anchor in entry, anchor
    entry = entry.replace(anchor, anchor + "\n    " + add)
open(ENTRY, "w").write(entry)
print("done")
