#!/usr/bin/env python3
"""Repo-side leak scan with a run stamp (ADVICE r11 item 2).

The driver's LEAKCHECK.json carries only {round, n_hits, hits}, so a
re-run is indistinguishable from a counter bump. This local equivalent
scans the same surface (src/, build.sbt, tools/, *.md at the root,
excluding generated round artifacts) for the same categories and stamps
the output with a UTC timestamp and the scanned-file count, writing
LEAKCHECK_local.json. Dev-side tool only — not part of the library.

Usage: python3 tools/leakcheck.py [repo_root]
"""
import datetime
import json
import os
import re
import sys

CATEGORIES = {
    # proprietary/internal package or import roots (nothing outside
    # org.apache.spark / scala / java / graft belongs in this repo)
    "internal-import": re.compile(
        r"import\s+(?!org\.apache\.|scala\.|java\.|javax\.|graft\.|org\.scalatest|org\.scalacheck|org\.slf4j|org\.apache)\w+\.(internal|corp|proprietary)"),
    "internal-url": re.compile(
        r"https?://[\w.-]*(corp|internal|intranet)[\w.-]*\."),
    "internal-pkg2": re.compile(
        r"\b(com|net|io)\.[\w]+\.(internal|corp)\b"),
    "internal-bucket": re.compile(
        r"\b(s3|gs|gcs|abfss?|wasbs?)://[\w.-]+(internal|corp|prod)[\w./-]*"),
    "slack-link": re.compile(r"slack\.com/archives|\bgo/[a-z][\w-]{2,}\b"),
    "api-key": re.compile(
        r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|AIza[\w-]{30,})\b"),
    "axon-env": re.compile(r"\b[A-Z]+_(INTERNAL|CORP)_[A-Z_]+\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".conf", ".properties"}
SKIP_NAMES = re.compile(
    r"^(BENCH_r\d+\.json|CORRECTNESS_r\d+\.json|LEAKCHECK.*\.json|COPYCHECK\.json|bench_detail_.*\.json)$")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    for base, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs
                   if d not in {"target", ".git", ".bloop", ".metals", "project"}]
        for fn in files:
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            rel = os.path.relpath(os.path.join(base, fn), root)
            if SKIP_NAMES.match(fn):
                continue
            n_files += 1
            try:
                text = open(os.path.join(base, fn), encoding="utf-8",
                            errors="replace").read()
            except OSError:
                continue
            for cat, rx in CATEGORIES.items():
                for i, line in enumerate(text.splitlines(), 1):
                    if rx.search(line):
                        hits[cat].append(f"{rel}:{i}")
    out = {
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "n_files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(root, "LEAKCHECK_local.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({"n_files_scanned": n_files, "n_hits": out["n_hits"]}))


if __name__ == "__main__":
    main()
