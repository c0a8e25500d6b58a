#!/usr/bin/env python3
"""Pre-commit gate (VERDICT r12 item 2) — the four registry-parity
assertions the test suite makes, runnable in one command so a
final-sprint operator can't land half-gated again:

  1. registry <-> oracle parity  (graft.Gate: queries vs oracleSql)
  2. CATALOG.md freshness        (regenerate; must be git-identical)
  3. CATALOG count == registry count
  4. README/SURVEY current-count claims == registry count

Usage: python3 tools/gate.py        (from the repo root)
Exit 0 = all four hold. Any failure prints the fix and exits 1.
"""
import re
import subprocess
import sys

FAIL = 0


def fail(msg):
    global FAIL
    print(f"[gate] FAIL: {msg}")
    FAIL = 1


def main():
    # 1. registry <-> oracle parity via the JVM (exact — the maps may
    #    be computed, so source-grepping is not authoritative)
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Gate"],
        capture_output=True, text=True)
    m = re.search(r"GATE queries=(\d+) oracles=(\d+) missing=\[(.*?)\] extra=\[(.*?)\]",
                  r.stdout)
    if not m:
        fail("graft.Gate did not run (compile error?); sbt tail:\n"
             + "\n".join(r.stdout.splitlines()[-15:]))
        sys.exit(1)
    nq, missing, extra = int(m.group(1)), m.group(3), m.group(4)
    if missing:
        fail(f"queries without oracles: {missing} — add oracleSql entries")
    if extra:
        fail(f"oracles without queries: {extra} — register or remove")
    print(f"[gate] registry parity: {nq} queries, oracles aligned"
          if not (missing or extra) else f"[gate] registry count {nq}")

    # 2. CATALOG.md freshness: regenerate; fail only if that CHANGED
    #    the on-disk file (a pending-but-fresh catalog is fine — it
    #    just needs staging like any other part of the commit)
    before = open("CATALOG.md", encoding="utf-8").read()
    subprocess.run([sys.executable, "tools/catalog.py"],
                   capture_output=True, text=True)
    if open("CATALOG.md", encoding="utf-8").read() != before:
        fail("CATALOG.md was stale — tools/catalog.py regenerated it; "
             "review + stage the change")
    else:
        print("[gate] CATALOG.md fresh")

    # 3. CATALOG count == registry count
    cat = open("CATALOG.md", encoding="utf-8").read()
    mc = re.search(r"\*\*(\d+) operators\.\*\*", cat)
    ncat = int(mc.group(1)) if mc else -1
    if ncat != nq:
        fail(f"CATALOG.md header says {ncat} operators, registry has {nq}")
    else:
        print(f"[gate] CATALOG count {ncat} == registry")

    # 4. docs current-count claims (the single live claim per doc)
    for path, rx in (("README.md", r"all (\d+) registered"),
                     ("SURVEY.md", r"\*\*(\d+) registered queries")):
        txt = open(path, encoding="utf-8").read()
        md = re.search(rx, txt)
        n = int(md.group(1)) if md else -1
        if n != nq:
            fail(f"{path} count claim says {n}, registry has {nq} — resync")
        else:
            print(f"[gate] {path} claim {n} == registry")

    # 5. no non-test source file may regrow past 3,000 lines (r13
    #    verdict item 3: Relational.scala reached 8,303 before the
    #    trait-mixin split; this pins the ceiling so it can't recur)
    import os
    for dirpath, _, files in os.walk("src/main"):
        for fn in files:
            if fn.endswith(".scala"):
                p = os.path.join(dirpath, fn)
                n = sum(1 for _ in open(p, encoding="utf-8"))
                if n > 3000:
                    fail(f"{p} is {n} lines (>3000) — split it (trait-mixin "
                         "pattern, see RelationalCoreOps.scala)")
    if not FAIL:
        print("[gate] source file sizes: all <= 3000 lines")

    print("[gate] OK" if not FAIL else "[gate] FAILED")
    sys.exit(FAIL)


if __name__ == "__main__":
    main()
