#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tmp/compare.py <sfDir> <dumpDir> [--pandas]

For each <name>.parquet dump in dumpDir, looks up oracle SQL in
dumpDir/oracle_sql.json (accepts the key with OR without the .parquet
suffix — mirroring the driver, which keys by dump file name), runs it in
DuckDB over the sfDir parquet tables, and compares rows / schema / a
value hash with columns sorted by name.

--pandas routes both result sets through DuckDB's pandas/arrow bridge
(rel.df()) instead of fetchall(). fetchall() returns DuckDB HUGEINT as a
plain Python int, hiding type divergences the driver's pandas-based
hasher DOES see (an uncast integer sum() is HUGEINT, which pandas
renders as object/float — the exact q58/q82/q83 three-round red).
Run BOTH modes before calling a query green.
"""
import sys, os, json, glob, hashlib
import duckdb

USE_PANDAS = "--pandas" in sys.argv

# --only qNN_name[,qMM_name...]: compare just those dumps (sf1 sweep runs
# one oracle per subprocess so `timeout` can bound the closure family).
# --threads N: cap DuckDB's thread pool (leave bench headroom on the box).
ONLY = None
THREADS = None
for i, a in enumerate(sys.argv):
    if a == "--only" and i + 1 < len(sys.argv):
        ONLY = set(sys.argv[i + 1].split(","))
    if a == "--threads" and i + 1 < len(sys.argv):
        THREADS = int(sys.argv[i + 1])

def fetch(rel):
    """(cols, rows) — optionally via the pandas path the driver uses."""
    if not USE_PANDAS:
        return [c[0] for c in rel.description], rel.fetchall()
    df = rel.df()
    return list(df.columns), [tuple(r) for r in df.itertuples(index=False, name=None)]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
    # numpy scalars/arrays from the --pandas path: true ndarrays render
    # like lists; every other numpy value (np.str_, np.float64, …) goes
    # through .item() so its canon form matches the fetchall path (a
    # bare hasattr(__len__) check would shred np.str_ into chars)
    t = type(v).__module__
    if t == "numpy":
        import numpy as np
        if isinstance(v, np.ndarray):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return canon(v.item())
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    argv = sys.argv[1:]
    skip_next = False
    args = []
    for i, a in enumerate(argv):
        if skip_next:
            skip_next = False
            continue
        if a in ("--only", "--threads"):
            skip_next = True
            continue
        if a.startswith("--"):
            continue
        args.append(a)
    sf_dir, dump_dir = args[0], args[1]
    oracles = json.load(open(os.path.join(dump_dir, "oracle_sql.json")))
    con = duckdb.connect()
    if THREADS:
        con.execute(f"SET threads={THREADS}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleData sf1)
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = n_bad = n_rows_only = 0
    for d in sorted(glob.glob(os.path.join(dump_dir, "*.parquet"))):
        name = os.path.basename(d)          # e.g. q01_pricing_summary.parquet
        bare = name[:-len(".parquet")]
        if ONLY is not None and bare not in ONLY and name not in ONLY:
            continue
        sql = oracles.get(name) or oracles.get(bare)
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')")
        s_cols, s_rows = fetch(spark_rel)
        if sql is None:
            print(f"{bare:32s} rows-only  spark_rows={len(s_rows)}")
            n_rows_only += 1
            continue
        try:
            o_rel = con.execute(sql)
            o_cols, o_rows = fetch(o_rel)
        except Exception as e:
            print(f"{bare:32s} FAIL oracle sql error: {e}")
            n_bad += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        hash_ok = schema_ok and table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows)
        if rows_ok and schema_ok and hash_ok:
            print(f"{bare:32s} OK         rows={len(s_rows)}")
            n_ok += 1
        else:
            print(f"{bare:32s} FAIL rows {len(s_rows)}/{len(o_rows)} "
                  f"schema_ok={schema_ok} hash_ok={hash_ok}")
            if not schema_ok:
                print(f"   spark cols:  {sorted(s_cols)}")
                print(f"   oracle cols: {sorted(o_cols)}")
            n_bad += 1
    print(f"\n{n_ok} OK, {n_bad} FAIL, {n_rows_only} rows-only")
    sys.exit(1 if n_bad else 0)

main()
