#!/usr/bin/env python3
"""Hash-compare two Verify dump directories query-by-query (the
compare.py canonicalization, columns sorted by name, rows as sorted
canon lines). Used to prove engine-side byte-stability of a plan
refactor at a scale where re-running the ORACLE is expensive: if the
new dump hashes equal the old dump's, the old dump's green oracle
comparison carries over to the new code.

Usage: python3 tools/dump_diff.py <dumpDirA> <dumpDirB> [q1,q2,...]
"""
import hashlib
import os
import sys

import duckdb


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def load(con, d):
    rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    return [c[0] for c in rel.description], rel.fetchall()


def main():
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    bad = 0
    names = sorted(n for n in os.listdir(a) if n.endswith(".parquet"))
    for n in names:
        q = n[:-len(".parquet")]
        if only is not None and q not in only and n not in only:
            continue
        if not os.path.isdir(os.path.join(b, n)):
            print(f"{q:32s} MISSING in {b}")
            bad += 1
            continue
        ca, ra = load(con, os.path.join(a, n))
        cb, rb = load(con, os.path.join(b, n))
        ok = (sorted(ca) == sorted(cb) and len(ra) == len(rb)
              and table_hash(ca, ra) == table_hash(cb, rb))
        print(f"{q:32s} {'SAME' if ok else 'DIFF'} rows={len(ra)}/{len(rb)}")
        bad += 0 if ok else 1
    sys.exit(1 if bad else 0)


main()
