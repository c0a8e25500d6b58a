#!/usr/bin/env python3
"""Generate CATALOG.md — one line per registered operator — from the
registry source itself (VERDICT r11 item 7).

Parses each graft.operators module's `val queries = Map(...)` block
for `"name" -> methodRef` entries, resolves the method's `def` line,
and takes the first sentence of its Scaladoc as the contract phrase.
CatalogSpec asserts the generated table stays complete vs
SparkEntry.queries, so a new operator without a catalog row fails one
loud test.

Usage: python3 tools/catalog.py [repo_root]
"""
import os
import re
import sys

MODULE_DIR = "src/main/scala/graft/operators"

ENTRY_RX = re.compile(r'^\s*"([a-z0-9_]+)"\s*->\s*([A-Za-z]\w*)\s*[,)]*\s*$')
LAMBDA_RX = re.compile(r'^\s*"([a-z0-9_]+)"\s*->\s*\(')


def first_sentence(doc_lines):
    text = " ".join(doc_lines)
    text = re.sub(r"\s+", " ", text).strip()
    # cut at the first sentence end (". " or final "."), cap length
    m = re.search(r"(?<![A-Z])\.(?:\s|$)", text)
    if m:
        text = text[: m.start() + 1]
    if len(text) > 160:
        text = text[:157].rstrip() + "..."
    return text


def scaladoc_above(lines, def_idx):
    """First sentence of the /** ... */ block ending just above def_idx."""
    i = def_idx - 1
    # skip annotations / blank lines
    while i >= 0 and (not lines[i].strip() or lines[i].strip().startswith("@")):
        i -= 1
    if i < 0 or not lines[i].strip().endswith("*/"):
        return ""
    end = i
    while i >= 0 and "/**" not in lines[i]:
        i -= 1
    if i < 0:
        return ""
    doc = []
    for ln in lines[i : end + 1]:
        s = ln.strip()
        s = re.sub(r"^/\*\*", "", s)
        s = re.sub(r"\*/$", "", s)
        s = re.sub(r"^\*\s?", "", s)
        doc.append(s)
    text = first_sentence(doc)
    # strip scaladoc link markup for the markdown table
    text = re.sub(r"\[\[([^\]]+)\]\]", r"`\1`", text)
    return text.replace("|", "\\|")


DEF_RX = re.compile(r"\s*(?:private\[\w+\]\s+)?def (\w+)\s*[(\[:]")


def index_defs(root):
    """Global def index across every module file: name -> list of
    (basename, line idx, file lines) candidates. Needed since the
    Relational trait-mixin split (r13 verdict item 3): a registry
    entry in Relational.scala may reference a def living in a sibling
    slice file. Same-file resolution still wins (parse_module checks
    its own file first); cross-file collisions are resolved by the
    caller, which prefers SIBLING SLICE files of the referencing
    module (ADVICE r14: first-alphabetical-wins could anchor a ref to
    a same-named def in an unrelated module). The def regex also
    accepts parameter-less and generic defs (`def fooSql: String`,
    `def foo[T](...)`)."""
    index = {}
    for fn in sorted(os.listdir(os.path.join(root, MODULE_DIR))):
        if not fn.endswith(".scala"):
            continue
        lines = open(os.path.join(root, MODULE_DIR, fn), encoding="utf-8").read().splitlines()
        seen = set()
        for idx, ln in enumerate(lines):
            m = DEF_RX.match(ln)
            if m and m.group(1) not in seen:
                seen.add(m.group(1))
                index.setdefault(m.group(1), []).append((fn, idx, lines))
    return index


def pick_candidate(cands, base):
    """Resolve a cross-file def collision: prefer a sibling slice of
    the referencing module (one file's stem prefixes the other's —
    Relational.scala <-> RelationalCoreOps.scala), else first
    alphabetical (the legacy rule)."""
    stem = base[:-len(".scala")]
    sibs = [c for c in cands
            if c[0][:-len(".scala")].startswith(stem)
            or stem.startswith(c[0][:-len(".scala")])]
    return (sibs or cands)[0]


def parse_module(path, global_defs):
    lines = open(path, encoding="utf-8").read().splitlines()
    # def line index per method name (objects are flat — one def per name)
    defs = {}
    for idx, ln in enumerate(lines):
        m = DEF_RX.match(ln)
        if m and m.group(1) not in defs:
            defs[m.group(1)] = idx
    # the queries block: from `val queries` to its closing paren at depth 0
    entries = []
    in_block = False
    depth = 0
    for ln in lines:
        if not in_block and re.match(r"\s*(?:@transient\s+)?val queries\s*:", ln):
            in_block = True
            depth = ln.count("(") - ln.count(")")
            continue
        if in_block:
            m = ENTRY_RX.match(ln)
            if m:
                entries.append((m.group(1), m.group(2)))
            elif LAMBDA_RX.match(ln):
                entries.append((LAMBDA_RX.match(ln).group(1), None))
            depth += ln.count("(") - ln.count(")")
            if depth <= 0:
                break
    rows = []
    base = os.path.basename(path)
    for name, ref in entries:
        if ref and ref in defs:
            idx = defs[ref]
            rows.append((name, f"{base}:{idx + 1}", scaladoc_above(lines, idx)))
        elif ref and ref in global_defs:
            gfn, idx, glines = pick_candidate(global_defs[ref], base)
            rows.append((name, f"{gfn}:{idx + 1}", scaladoc_above(glines, idx)))
        else:
            rows.append((name, base, ""))
    return rows


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    global_defs = index_defs(root)
    rows = []
    for fn in sorted(os.listdir(os.path.join(root, MODULE_DIR))):
        if fn.endswith(".scala"):
            rows.extend(parse_module(os.path.join(root, MODULE_DIR, fn), global_defs))
    rows.sort(key=lambda r: r[0])
    missing_doc = [r[0] for r in rows if not r[2]]
    with open(os.path.join(root, "CATALOG.md"), "w") as f:
        f.write("# Operator catalog\n\n")
        f.write(
            "Generated by `tools/catalog.py` from the registry source — do not\n"
            "edit by hand. One row per `SparkEntry.queries` entry; `CatalogSpec`\n"
            f"asserts completeness. **{len(rows)} operators.**\n\n")
        f.write("| operator | where | contract |\n|---|---|---|\n")
        for name, where, doc in rows:
            f.write(f"| `{name}` | `{where}` | {doc} |\n")
    print(f"CATALOG.md: {len(rows)} operators, {len(missing_doc)} without doc"
          + (f" ({', '.join(missing_doc[:8])})" if missing_doc else ""))


if __name__ == "__main__":
    main()
