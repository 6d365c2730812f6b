#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, and compares: column names (sorted), row count, and a
hash of the value matrix with columns sorted by name and rows sorted.
"""
import sys, os, json, glob, hashlib
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    # Verify casts decimal outputs to double (driver-compare parity);
    # duckdb fetchall still returns Decimal — normalize to float here.
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir, out_dir):
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
    # A query that crashed in Verify writes no output dir; every oracle
    # name (and every _errors.json name) MUST still produce a row —
    # silence is how round 9 reported 112/112 green during a 41% outage.
    names = sorted(dirs | set(oracle) | set(errors))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if name not in dirs:
            why = errors.get(name, "no output dir (query crashed in Verify?)")
            print(f"FAIL {name}: {why}")
            n_fail += 1
            continue
        if name in errors:  # dir exists but the write died midway
            print(f"FAIL {name}: {errors[name]}")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        s_cols = list(tbl.column_names)
        s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(s_rows)})")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracle[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        elif table_hash(s_cols, s_rows) != table_hash(d_cols, d_rows):
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            ms = sorted(tuple(norm_cell(r[i]) for i in order_s) for r in s_rows)
            md = sorted(tuple(norm_cell(r[i]) for i in order_d) for r in d_rows)
            shown = 0
            for a, b in zip(ms, md):
                if a != b and shown < 3:
                    print(f"  spark: {a}\n  duck : {b}")
                    shown += 1
            ok = False
        if ok:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
