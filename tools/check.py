#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB
(fixture tables registered as views by bare name), sorts columns by
name and rows by value, and diffs. NOT part of the shipped library —
dev-side validation only (duckdb/pandas are driver-side tools).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _cell(v):
    # ndarray/list/tuple → tuple (sortable/hashable); scalars untouched.
    # Applied unconditionally per cell (ADVICE r11: a gated column-level
    # .any() probe can skip conversion when the probe itself chokes or
    # the first chunk's cells look scalar — the per-cell form cannot).
    if isinstance(v, (list, tuple)):
        return tuple(_cell(x) for x in v)
    if hasattr(v, "tolist") and getattr(v, "ndim", 0):
        return tuple(_cell(x) for x in v.tolist())
    return v


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # datetimes → utc-naive micros; arrays → tuples (sortable/hashable)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.floor("us").astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].map(_cell)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"[SQLERR] {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} duck={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(exp)}")
            n_bad += 1
            continue
        if got.equals(exp):
            print(f"[OK]   {name}: {len(got)} rows")
            n_ok += 1
        else:
            neq = (got.values != exp.values)
            print(f"[DIFF] {name}: {neq.sum()} cell diffs of {neq.size}")
            mask = neq.any(axis=1)
            print("spark:", got[mask].head(3).to_string())
            print("duck :", exp[mask].head(3).to_string())
            # dtype detail
            print("dtypes spark:", dict(got.dtypes.astype(str)))
            print("dtypes duck :", dict(exp.dtypes.astype(str)))
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
