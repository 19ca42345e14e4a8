#!/usr/bin/env python3
"""One-shot refactoring tool (round-9 verdict ask #8): split the 12k-line
SparkEntry.scala into per-family registry files under graft/entry/ with
ZERO behavior change.

- Scans the `queries` and `oracleSql` map literals with a lexer that
  understands Scala string forms (", s", \"\"\", s\"\"\" with ${...}
  nesting) and comments, so entry boundaries are exact.
- Families come from the `// --- name ---` section comments inside the
  queries map; each oracle entry follows its query's family.
- All shared private helpers move verbatim into
  `private[graft] object EntryHelpers`; family files import its members.
- Emits a slim SparkEntry that concatenates the family maps, so the
  driver contract (SparkEntry.queries / oracleSql / entry) is unchanged.

Run once, verify (full gate at both SFs), commit; the tool stays for
provenance.
"""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/entry"

text = open(SRC).read()
lines = text.split("\n")


def scan_entries(text, start_idx):
    """From the index of the opening Map( paren, yield
    (comment_or_none, entry_text) top-level entries plus trailing
    close index. Tracks (), {}, [], strings, comments."""
    i = start_idx  # points AT the '(' of Map(
    assert text[i] == "("
    depth = 1
    i += 1
    entries = []
    cur = []
    section = None
    pending_section = None

    def flush():
        nonlocal cur
        chunk = "".join(cur).strip()
        if chunk.strip(", \n"):
            entries.append((pending_section, chunk.rstrip().rstrip(",")))
        cur = []

    n = len(text)
    while i < n and depth > 0:
        c = text[i]
        two = text[i:i + 2]
        three = text[i:i + 3]
        if two == "//":
            j = text.find("\n", i)
            comment = text[i:j]
            m = re.match(r"// --- (.+?) -+", comment.strip())
            if m and depth == 1 and not "".join(cur).strip():
                pending_section = m.group(1).strip()
                i = j
                continue
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
            # handle 4/5-quote closers ("""" at end)
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
            # char literal or symbol; char lits like 'a' or '\n'
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
    return p + 3  # index of '('


q_open = find_map_open("def queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
q_entries, q_close = scan_entries(text, q_open)
o_open = find_map_open("def oracleSql: Map[String, String] = Map(")
o_entries, o_close = scan_entries(text, o_open)

# family per query name from section comments (sections in order)
FAMILY_OF_SECTION = {
    "core relational": "Relational",
    "reference ETL operators": "Etl",
    "dedup": "Dedup",
    "similarity search": "Similarity",
    "text analysis": "TextAnalysis",
    "scan / union / metadata": "Etl",
    "events / streaming twins": "Events",
    "corpus analytics": "Analytics",
}
fam_of_query = {}
current = None
fam_entries = {}
for section, entry in q_entries:
    if section is not None:
        current = FAMILY_OF_SECTION[section]
    m = re.search(r'"(q[0-9]+[a-z0-9_]*)"\s*->', entry)
    if not m:
        raise RuntimeError("entry without name: " + entry[:120])
    name = m.group(1)
    fam = current
    if fam == "Analytics":
        num = int(re.match(r"q(\d+)", name).group(1))
        fam = ("AnalyticsCore" if num < 160 else
               "AnalyticsStats" if num < 240 else
               "AnalyticsShapes" if num < 300 else "AnalyticsAgreement")
    fam_of_query[name] = fam
    fam_entries.setdefault(fam, {"q": [], "o": []})["q"].append(entry)

for section, entry in o_entries:
    m = re.search(r'"(q[0-9]+[a-z0-9_]*)"\s*->', entry)
    if not m:
        raise RuntimeError("oracle entry without name: " + entry[:120])
    name = m.group(1)
    fam = fam_of_query.get(name)
    if fam is None:
        raise RuntimeError("oracle without query: " + name)
    fam_entries[fam]["o"].append(entry)

# ---- helper region extraction ------------------------------------------
header_end = text.index("object SparkEntry {")
obj_open = text.index("{", header_end)
q_decl_start = text.rindex("/** One entry per implemented operator",
                           0, text.index("def queries: Map[String,"))
entry_decl_start = text.rindex("/** Flagship query", 0, q_decl_start)
o_decl_start = text.rindex("/** For each key in queries",
                           0, text.index("def oracleSql: Map[String, String]"))
obj_close = text.rindex("}")

pre_helpers = text[obj_open + 1:entry_decl_start]
entry_decl = text[entry_decl_start:q_decl_start]
mid_helpers = text[q_close + 1:o_decl_start]
post_helpers = text[o_close + 1:obj_close]
header = text[:header_end]

# chained package clauses so `operators.X` / `functions.X` keep
# resolving relative to package graft, exactly as in the monolith;
# the monolith's own scaladoc stays on the slim SparkEntry only
GEN_HEADER = header[:header.rindex("/**")].replace(
    "package graft\n", "package graft\npackage entry\n", 1)


def deprivatize(s):
    s = re.sub(r"(\n  )private (def|val|lazy val) ", r"\1\2 ", s)
    return s


import os
os.makedirs(OUT_DIR, exist_ok=True)
HEL = f"""{GEN_HEADER}/** Shared plumbing for the per-family gate registries under
  * [[graft.entry]] — the table readers, cross-engine SQL fragment
  * generators, and portable-hash CTE builders that SparkEntry's two
  * monolithic maps used to close over (round-10 split, r9 verdict
  * ask #8; pure move, zero behavior change — every def/val below is
  * verbatim from SparkEntry.scala at split time, minus the `private`
  * modifiers the object boundary now provides).
  */
private[graft] object EntryHelpers {{
{deprivatize(pre_helpers.rstrip())}
{deprivatize(mid_helpers.rstrip())}
{deprivatize(post_helpers.rstrip())}
}}
"""
open(f"{OUT_DIR}/EntryHelpers.scala", "w").write(HEL)

FAM_DOC = {
    "Relational": "core relational shapes (TPC-H-ish scans, joins, windows, rollups)",
    "Etl": "reference ETL operators + scan/union/metadata surface",
    "Dedup": "the dedup family (exact, MinHash/LSH, SimHash, semantic, spans)",
    "Similarity": "ANN / similarity search (brute force, IVF ladder, graph, PQ)",
    "TextAnalysis": "text analysis (tokens, quality, contamination, BPE)",
    "Events": "events / streaming batch twins",
    "AnalyticsCore": "corpus analytics, rounds 1-4 (mixing, packing, stores, sampling)",
    "AnalyticsStats": "corpus analytics, rounds 5-6 (stats tests, time series, graphs)",
    "AnalyticsShapes": "corpus analytics, rounds 7-8 (TPC-H shapes, keys, agreement)",
    "AnalyticsAgreement": "corpus analytics, rounds 9-10 (agreement, drift, quantizer gates)",
}

for fam, ent in fam_entries.items():
    qs = ",\n\n".join(e for e in ent["q"])
    os_ = ",\n\n".join(e for e in ent["o"])
    body = f"""{GEN_HEADER.rstrip()}

import graft.entry.EntryHelpers._

/** Gate registry, {FAM_DOC[fam]} — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract.
  */
private[graft] object Gates{fam} {{

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

{qs})

  val oracles: Map[String, String] = Map(

{os_})
}}
"""
    open(f"{OUT_DIR}/Gates{fam}.scala", "w").write(body)

fams = list(fam_entries.keys())
qcat = " ++\n    ".join(f"graft.entry.Gates{f}.queries" for f in fams)
ocat = " ++\n    ".join(f"graft.entry.Gates{f}.oracles" for f in fams)
slim = f"""{header}object SparkEntry {{
{entry_decl.rstrip()}

  /** One entry per implemented operator from SURVEY.md §2 — the
    * driver contract, concatenated from the per-family registries
    * under [[graft.entry]] (round-10 split of the former 12k-line
    * monolith; key sets are disjoint by construction — every gate
    * name is unique — so ++ order is immaterial). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    {qcat}

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Non-SQL-expressible ops are omitted (driver
    * records a rows-only check). */
  def oracleSql: Map[String, String] =
    {ocat}
}}
"""
open(SRC, "w").write(slim)
print("families:", {f: (len(v["q"]), len(v["o"])) for f, v in fam_entries.items()})
print("total queries:", sum(len(v["q"]) for v in fam_entries.values()))
print("total oracles:", sum(len(v["o"]) for v in fam_entries.values()))
