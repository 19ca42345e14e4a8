#!/usr/bin/env python3
"""Round-13 registry split (r12 verdict ask #7): GatesAnalyticsCore
is at 2,984 lines — move the q104+ pipeline block (sampling, mixtures,
sketch stores, time-series, linkage, cleaners) verbatim into
GatesAnalyticsPipeline.scala. Same lexer as split_entry.py (strings,
interpolations, comments tracked exactly), zero behavior change:
entries are byte-identical, SparkEntry gains one concatenation term.
"""
import re

SRC = "src/main/scala/graft/entry/GatesAnalyticsCore.scala"
DST = "src/main/scala/graft/entry/GatesAnalyticsPipeline.scala"
ENTRY = "src/main/scala/graft/SparkEntry.scala"

text = open(SRC).read()


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


def find_map_open(anchor):
    k = text.find(anchor)
    assert k >= 0, anchor
    p = text.find("Map(", k)
    return p + 3


q_open = find_map_open("val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
q_entries, q_close = scan_entries(text, q_open)
o_open = find_map_open("val oracles: Map[String, String] = Map(")
o_entries, o_close = scan_entries(text, o_open)


def name_of(entry):
    m = re.search(r'"(q[0-9]+[a-z0-9_]*)"\s*->', entry)
    if not m:
        raise RuntimeError("entry without name: " + entry[:120])
    return m.group(1)


def moves(name):
    return int(re.match(r"q(\d+)", name).group(1)) >= 104


kept_q = [e for e in q_entries if not moves(name_of(e))]
moved_q = [e for e in q_entries if moves(name_of(e))]
kept_o = [e for e in o_entries if not moves(name_of(e))]
moved_o = [e for e in o_entries if moves(name_of(e))]
assert {name_of(e) for e in moved_q} == {name_of(e) for e in moved_o}, (
    sorted({name_of(e) for e in moved_q} ^ {name_of(e) for e in moved_o}))
print(f"keep {len(kept_q)} gates, move {len(moved_q)} gates")

HEADER = text[:text.index("/** Gate registry")]


def emit(path, obj, doc, qs, os_):
    body = (HEADER + doc + f"private[graft] object {obj} {{\n\n"
            + "  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n\n"
            + ",\n\n".join(qs)
            + ")\n\n  val oracles: Map[String, String] = Map(\n\n"
            + ",\n\n".join(os_) + ")\n}\n")
    open(path, "w").write(body)


emit(SRC, "GatesAnalyticsCore",
     """/** Gate registry, corpus analytics, rounds 1-4 (mixing, packing, stores, sampling) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract. Round 13: the q104+ pipeline block moved
  * verbatim to [[GatesAnalyticsPipeline]] (registry growth watch).
  */
""", kept_q, kept_o)
emit(DST, "GatesAnalyticsPipeline",
     """/** Gate registry, corpus-pipeline analytics (q104-q159: sampling,
  * mixtures, sketch stores, time-series, linkage, cleaners) — moved
  * verbatim out of GatesAnalyticsCore at round 13 (registry growth
  * watch: Core was at 2,984 lines; zero behavior change, every entry
  * byte-identical at split time). SparkEntry concatenates the family
  * maps back into the driver contract.
  */
""", moved_q, moved_o)

entry = open(ENTRY).read()
for anchor in ["graft.entry.GatesAnalyticsCore.queries ++",
               "graft.entry.GatesAnalyticsCore.oracles ++"]:
    suffix = anchor.rsplit(".", 1)[1]
    entry = entry.replace(
        anchor, anchor + f"\n    graft.entry.GatesAnalyticsPipeline.{suffix} ++")
open(ENTRY, "w").write(entry)
print("done")
