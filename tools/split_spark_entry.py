#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala into per-family query
registries under src/main/scala/graft/queries/, keeping SparkEntry as
the thin composition the driver contract requires. Pure text move — no
behavior change; every member block is copied verbatim.
"""
import re, sys, os

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/queries"

FAMILIES = {
    "RelationalQueries": dict(
        doc="Relational core: scans, joins, aggregation, window, storage "
            "layout, snapshots/CDC, and data-governance queries "
            "(SURVEY.md §2.1–§2.12).",
        nums={1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,32,37,38,
              39,40,41,42,45,47,48,51,53,54,56,61,63,67,69,76,77,80,86,87,88,
              91,92,93,94,96,97,98,99,101,105,106,107,108,137,140,160,165,168,
              169,170,172,173,176,177,189,190,191,193,194,214},
        helpers=[]),
    "DedupSimilarityQueries": dict(
        doc="Deduplication, similarity/ANN, retrieval and graph queries "
            "(SURVEY.md §7.4 dedup + similarity families).",
        nums={22,23,24,25,26,27,28,43,44,49,57,58,60,65,66,73,74,85,89,90,95,
              102,103,111,113,114,115,116,121,122,123,126,129,132,139,141,142,
              147,151,152,157,158,159,167,171,174,175,188,192,196,197,216,220},
        helpers=["bandedRecallVsExactL2", "matryoshkaRankSql", "mmrOracle",
                 "containmentPairsSql", "ngramJaccardOracle",
                 "jaccardPairsSql", "jaccardOracle"]),
    "TextMultimodalQueries": dict(
        doc="Text analysis, tokenization, multimodal decode and "
            "generation-eval queries (SURVEY.md §7.4 text + multimodal "
            "families).",
        nums={29,30,31,36,46,50,55,64,71,72,75,78,79,109,110,112,119,124,134,
              136,161,163,164,195,198,199,200,201,202,203,204,205,206,207,208,
              209,210,211,212,215,217,218,219},
        helpers=["multiRefPairs", "blocklistPatterns", "multiRefPairCtes",
                 "bleuPairOracle", "chrfPairOracle", "rougeLPairOracle",
                 "werPairOracle", "chrClipCtes", "ngramClipCtes",
                 "dhashClosedFormOracle", "poolClosedFormOracle",
                 "dhashBitCtes"]),
    "EventsStreamingQueries": dict(
        doc="Event-time, windowed, funnel/session/retention and "
            "streaming-state queries (SURVEY.md §7.4 events family).",
        nums={33,34,35,84,100,127,143,144,145,146,148,149,150,153,154,155,156,
              166,180,187,234},
        helpers=["funnelStateAudit"]),
    "StatsSamplingQueries": dict(
        doc="Statistics, sampling/mixture planning, sketches and "
            "model-audit queries (SURVEY.md §7.4 stats family).",
        nums={52,59,62,68,70,81,82,83,104,117,118,120,125,128,130,131,133,135,
              138,162,178,179,181,182,183,184,185,186,213,221,222,223,224,225,
              226,227,228,229,230,231,232,233,235,236,237},
        helpers=["langCalibrationCtes", "logregFeatureCte", "gdIterationCtes",
                 "aucOracle", "btIterationCtes"]),
}

text = open(SRC, encoding="utf-8").read()
lines = text.splitlines(keepends=True)

# ---- locate object body ------------------------------------------------
obj_start = next(i for i, l in enumerate(lines) if l.startswith("object SparkEntry {"))
# final closing brace = last line that is exactly "}"
obj_end = max(i for i, l in enumerate(lines) if l.rstrip("\n") == "}")

member_re = re.compile(r"^  (?:private\s+)?(?:lazy\s+)?(?:def|val)\s+(\w+)")
starts = []  # (line_idx, name)
for i in range(obj_start + 1, obj_end):
    m = member_re.match(lines[i])
    if m:
        starts.append((i, m.group(1)))

# attach the contiguous comment/blank block preceding each member
def block_start(idx):
    j = idx
    while j > obj_start + 1:
        prev = lines[j - 1]
        if re.match(r"^\s*(/\*\*|\*|//|$)", prev.rstrip("\n")) or prev.strip() == "":
            j -= 1
        else:
            break
    return j

blocks = []  # (name, text)
for k, (idx, name) in enumerate(starts):
    s = block_start(idx)
    e = starts[k + 1][0] if k + 1 < len(starts) else obj_end
    e = block_start(e) if k + 1 < len(starts) else e
    blocks.append((name, "".join(lines[s:e])))

names = [n for n, _ in blocks]
dupes = {n for n in names if names.count(n) > 1}
assert not dupes, f"duplicate member names: {dupes}"
by_name = dict(blocks)

# ---- parse the queries map ---------------------------------------------
qmap_txt = by_name["queries"]
entries = re.findall(r'"(\w+)" -> \((\w+) _\)', qmap_txt)
assert len(entries) == 237, f"expected 237 query entries, got {len(entries)}"
key_to_builder = dict(entries)

def qnum(key):
    return int(re.match(r"q(\d+)_", key).group(1))

# family per query key
key_fam = {}
for key in key_to_builder:
    n = qnum(key)
    fams = [f for f, spec in FAMILIES.items() if n in spec["nums"]]
    assert len(fams) == 1, f"{key} (q{n}) assigned to {fams}"
    key_fam[key] = fams[0]
covered = {n for spec in FAMILIES.values() for n in spec["nums"]}
wanted = {qnum(k) for k in key_to_builder}
assert covered == wanted, f"mismatch: extra={covered-wanted} missing={wanted-covered}"

# ---- parse the oracleSql map --------------------------------------------
omap_txt = by_name["oracleSql"]
olines = omap_txt.splitlines(keepends=True)
entry_start = re.compile(r'^    "(q\w+)" ->')
oidxs = [(i, entry_start.match(l).group(1)) for i, l in enumerate(olines)
         if entry_start.match(l)]
oracle_chunks = {}
carry = []  # comment lines that describe the NEXT entry
for k, (i, key) in enumerate(oidxs):
    e = oidxs[k + 1][0] if k + 1 < len(oidxs) else len(olines)
    chunk_lines = olines[i:e]
    # peel trailing blank/comment lines — they belong to the next entry
    tail = []
    while chunk_lines and (chunk_lines[-1].strip() == "" or
                           chunk_lines[-1].lstrip().startswith("//")):
        tail.insert(0, chunk_lines.pop())
    chunk = "".join(carry + chunk_lines)
    carry = [l for l in tail if l.strip() != ""]
    if k + 1 == len(oidxs):
        # strip the final Map-closing ')'
        chunk = re.sub(r"\)\s*$", "", chunk)
    # normalize trailing comma off; re-added at emit
    chunk = re.sub(r",\s*$", "", chunk.rstrip()) + "\n"
    oracle_chunks[key] = chunk
assert set(oracle_chunks) <= set(key_to_builder), \
    f"oracle keys not in queries: {set(oracle_chunks) - set(key_to_builder)}"

# ---- assign member blocks to files ---------------------------------------
helper_fam = {}
for fam, spec in FAMILIES.items():
    for h in spec["helpers"]:
        helper_fam[h] = fam

skip = {"t", "queries", "oracleSql", "entry"}
builder_fam = {}
for key, b in key_to_builder.items():
    builder_fam[b] = key_fam[key]

fam_members = {f: [] for f in FAMILIES}
unassigned = []
for name, blk in blocks:
    if name in skip:
        continue
    if name in builder_fam:
        fam_members[builder_fam[name]].append((name, blk))
    elif name in helper_fam:
        fam_members[helper_fam[name]].append((name, blk))
    else:
        unassigned.append(name)
assert not unassigned, f"unassigned members: {unassigned}"

# ---- emit ----------------------------------------------------------------
os.makedirs(OUT_DIR, exist_ok=True)

HEADER = """package graft.queries

import org.apache.spark.sql.{{Column, DataFrame, SparkSession}}
import org.apache.spark.sql.functions._

import graft.operators.{{GroupOps, Validation, ValidationRule}}
import graft.sources.Tables

/** {doc}
  *
  * One slice of [[graft.SparkEntry]]'s query surface (split from the
  * former 9.3k-line single file; pure move, no behavior change). Keys,
  * builders and oracle SQL are exactly the driver contract: every
  * `queries` entry that is SQL-expressible has a DuckDB `oracleSql`
  * twin with IDENTICAL column names (the compare hashes by sorted
  * column name).
  */
private[graft] object {name} extends QueryRegistry {{
"""

ordered_keys = [k for k, _ in entries]  # original map order
for fam, spec in FAMILIES.items():
    parts = [HEADER.format(doc=spec["doc"], name=fam)]
    for name, blk in fam_members[fam]:
        parts.append(blk.rstrip() + "\n\n")
    fam_keys = [k for k in ordered_keys if key_fam[k] == fam]
    qlines = ",\n".join(f'    "{k}" -> ({key_to_builder[k]} _)' for k in fam_keys)
    parts.append("  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n"
                 + qlines + ")\n\n")
    o_keys = [k for k in fam_keys if k in oracle_chunks]
    ochunks = ",\n".join(oracle_chunks[k].rstrip() for k in o_keys)
    parts.append("  def oracleSql: Map[String, String] = Map(\n" + ochunks + ")\n")
    parts.append("}\n")
    path = os.path.join(OUT_DIR, fam + ".scala")
    open(path, "w", encoding="utf-8").write("".join(parts))
    print(f"wrote {path}: {sum(p.count(chr(10)) for p in parts)} lines, "
          f"{len(fam_members[fam])} members, {len(fam_keys)} queries, {len(o_keys)} oracles")

print("total queries:", sum(len([k for k in ordered_keys if key_fam[k] == f]) for f in FAMILIES))
print("total oracles:", len(oracle_chunks))
