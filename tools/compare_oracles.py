#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare: for each query with an
entry in oracle_sql.json, run the SQL over the sf parquet tables, load the
Spark parquet dump, sort columns by name, sort rows, and hash values.

Usage: python3 tools/compare_oracles.py <sfDir> <verifyOutDir> [query ...]
"""
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        # DuckDB returns float32 for FLOAT-list lambdas (0.26 → 0.25999999…);
        # all engine float outputs are pre-rounded to ≤6dp, so a 6dp canon is
        # lossless on the Spark side and collapses the float32 representation
        return repr(round(v, 6))
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spath = f"{out_dir}/{name}"
        if not os.path.isdir(spath):
            print(f"{name}: MISSING spark dump")
            n_bad += 1
            continue
        tbl = pq.read_table(spath)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_bad += 1
            continue
        rows_match = len(s_rows) == len(o_rows)
        schema_match = sorted(s_cols) == sorted(o_cols)
        hash_match = (frame_hash(s_cols, s_rows) == frame_hash(o_cols, o_rows)
                      if rows_match and schema_match else False)
        ok = rows_match and schema_match and hash_match
        n_ok += ok
        n_bad += not ok
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"rows {len(s_rows)}/{len(o_rows)} schema {schema_match} hash {hash_match}")
        if not ok and rows_match and schema_match:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            sset = sorted("|".join(canon(r[i]) for i in order) for r in s_rows)
            oorder = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
            oset = sorted("|".join(canon(r[i]) for i in oorder) for r in o_rows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:5]
            for a, b in diffs:
                print(f"  spark : {a}\n  oracle: {b}")
    print(f"== {n_ok} OK, {n_bad} not OK ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
