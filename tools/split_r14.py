#!/usr/bin/env python3
"""Round-14 registry split (r13 verdict ask #7): the next pair on the
3k-line watch. GatesAnalyticsShapes (2,318) loses its 18 TPC-H planner
shapes to a new GatesTpch.scala; GatesAnalyticsPipeline (1,906) loses
the q139-q159 linkage / text-index / product-analytics block to a new
GatesProductAnalytics.scala. Same lexer as split_entry.py /
split_core_r13.py (strings, interpolations, comments tracked exactly),
zero behavior change: entries are byte-identical, SparkEntry gains one
concatenation term per new file.
"""
import re

SHAPES = "src/main/scala/graft/entry/GatesAnalyticsShapes.scala"
TPCH = "src/main/scala/graft/entry/GatesTpch.scala"
PIPE = "src/main/scala/graft/entry/GatesAnalyticsPipeline.scala"
PROD = "src/main/scala/graft/entry/GatesProductAnalytics.scala"
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


TPCH_SET = {
    "q241_tpch_q17", "q242_tpch_q18", "q248_tpch_q21", "q251_tpch_q20",
    "q256_tpch_q2", "q257_tpch_q11", "q258_tpch_q15", "q259_tpch_q22",
    "q263_tpch_q7", "q264_tpch_q8", "q265_tpch_q9", "q266_tpch_q12",
    "q267_tpch_q13", "q268_tpch_q14", "q269_tpch_q16", "q270_tpch_q19",
    "q335_tpch_q6", "q336_tpch_q4",
}

split_file(
    SHAPES, TPCH, "GatesTpch",
    lambda n: n in TPCH_SET,
    """/** Gate registry, corpus analytics, rounds 7-8 (keys, agreement,
  * graph/stat shapes) — split verbatim out of SparkEntry.scala
  * (round 10, r9 verdict ask #8). Round 14: the 18 TPC-H planner
  * shapes moved verbatim to [[GatesTpch]] (registry growth watch:
  * Shapes was at 2,318 lines; zero behavior change).
  */
""",
    """/** Gate registry, TPC-H planner shapes (Q2/Q4/Q6/Q7/Q8/Q9/Q11/Q12/
  * Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22) — moved verbatim out of
  * GatesAnalyticsShapes at round 14 (registry growth watch; zero
  * behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
""")


def prod_moves(name):
    return 139 <= int(re.match(r"q(\d+)", name).group(1)) <= 159


split_file(
    PIPE, PROD, "GatesProductAnalytics",
    prod_moves,
    """/** Gate registry, corpus-pipeline analytics (q104-q138: sampling,
  * mixtures, sketch stores, cleaners) — moved verbatim out of
  * GatesAnalyticsCore at round 13 (registry growth watch). Round 14:
  * the q139-q159 linkage / text-index / product-analytics block moved
  * verbatim to [[GatesProductAnalytics]] (Pipeline was at 1,906
  * lines; zero behavior change). SparkEntry concatenates the family
  * maps back into the driver contract.
  */
""",
    """/** Gate registry, record-linkage / text-index / product analytics
  * (q139-q159: TF-IDF, BM25 + trigram stores, Fellegi-Sunter linkage,
  * rolling windows, funnels, cohorts, CDC) — moved verbatim out of
  * GatesAnalyticsPipeline at round 14 (registry growth watch; zero
  * behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
""")

entry = open(ENTRY).read()
for anchor, add in [
    ("graft.entry.GatesAnalyticsShapes.queries", "graft.entry.GatesTpch.queries"),
    ("graft.entry.GatesAnalyticsShapes.oracles", "graft.entry.GatesTpch.oracles"),
    ("graft.entry.GatesAnalyticsPipeline.queries ++",
     "graft.entry.GatesProductAnalytics.queries ++"),
    ("graft.entry.GatesAnalyticsPipeline.oracles ++",
     "graft.entry.GatesProductAnalytics.oracles ++"),
]:
    assert anchor in entry, anchor
    if anchor.endswith("++"):
        entry = entry.replace(anchor, anchor + "\n    " + add)
    else:
        # Shapes is the last term (no trailing ++): append the new one.
        entry = entry.replace(anchor, anchor + " ++\n    " + add)
open(ENTRY, "w").write(entry)
print("done")
