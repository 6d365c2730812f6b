#!/usr/bin/env python3
"""Strict driver-mimic correctness check.

The driver's gate (CORRECTNESS_r02) compares pandas frames: spark
parquet via pd.read_parquet vs DuckDB oracle via .df(), columns sorted
by name, rows sorted via DataFrame.sort_values, then a value hash.
tools/check_correctness.py normalizes floats/decimals, which hid
dtype-level mismatches (Decimal vs float64, tz-aware timestamps) that
the driver catches. This checker reproduces the stricter compare and
prints the offending column + first differing cells with dtypes.

Usage: python3 tools/check_driver.py <sfDir> <verifyOutDir> [name...]
"""
import sys, os, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        return None, f"sort_values error: {e}"
    return df.reset_index(drop=True), None


import datetime


def _norm(v):
    # DuckDB .df() renders DATE as datetime64; CORRECTNESS_r02 shows the
    # driver hash-matches spark date vs duck midnight-timestamp (b4, f10
    # passed), so normalize the two representations together.
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"{v} 00:00:00"
    return str(v)


def cells(df):
    # normalized str() of every cell — a stand-in for the value hash
    return [[(type(v).__name__, _norm(v)) for v in row]
            for row in df.itertuples(index=False, name=None)]


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    err_path = os.path.join(out_dir, "_errors.json")
    errors = json.load(open(err_path)) if os.path.exists(err_path) else {}
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    # every oracle/_errors name yields a row even with no output dir —
    # a query that crashed in Verify must FAIL loudly, not vanish
    names = sorted(dirs | set(oracle) | set(errors))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_skip = 0
    for name in names:
        if name not in dirs or name in errors:
            why = errors.get(name, "no output dir (query crashed in Verify?)")
            print(f"FAIL {name}: {why}")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if name not in oracle:
            print(f"SKIP {name}: no oracle")
            n_skip += 1
            continue
        s = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                      ignore_index=True)
        try:
            d = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(s.columns) != sorted(d.columns):
            print(f"FAIL {name}: cols spark={sorted(s.columns)} duck={sorted(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        s2, err_s = canon(s)
        d2, err_d = canon(d)
        if err_s or err_d:
            print(f"FAIL {name}: spark[{err_s}] duck[{err_d}]")
            n_fail += 1
            continue
        cs, cd = cells(s2), cells(d2)
        bad = []
        for i, (rs, rd) in enumerate(zip(cs, cd)):
            for j, (a, b) in enumerate(zip(rs, rd)):
                if a[1] != b[1]:
                    bad.append((i, s2.columns[j], a, b))
        if bad:
            dts = {c: (str(s2[c].dtype), str(d2[c].dtype)) for c in s2.columns
                   if str(s2[c].dtype) != str(d2[c].dtype)}
            print(f"FAIL {name}: {len(bad)} differing cells; dtype diffs: {dts}")
            for i, c, a, b in bad[:4]:
                print(f"  row {i} col {c}: spark {a} duck {b}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS {name} ({len(s)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
