#!/usr/bin/env python3
"""Closure-family oracle at LARGE scale, generalized from cc_label_oracle.py.

The recorded oracles for q52/q97/q129/q143/q144 all close the duplicate
graph with the SAME recursive block:

    reach(u, v) AS (SELECT u, v FROM edges UNION
                    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
    lbl AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u),

which materializes the full REACHABILITY relation — O(sum of cluster
size^2) rows, impractical on sf1's giant LSH component (the r17 sweep's
10-50+ min per oracle). This tool computes the SAME `lbl` (component =
min reachable id; every consumer takes least(doc_id, mn), so labeling
each node with its component minimum is equivalent) by semi-naive
min-label propagation — one O(E) edges-join per round, O(component
diameter) rounds — then re-runs the ORIGINAL oracle SQL with the
recursive block textually replaced by a scan of the propagated table.
Everything before (the minhash/banded/pairs/edges prefix) and after
(asg/election/quality tails) is the recorded oracle VERBATIM.

Usage: python3 tools/closure_oracle.py <sfDir> <dumpDir> <queryName>
(reads <dumpDir>/oracle_sql.json and <dumpDir>/<queryName>.parquet,
prints the same verdict line as tools/compare.py, exit 0 iff green).
"""
import hashlib
import json
import os
import sys

import duckdb

REACH_RE = (
    "reach(u, v) AS (\n"
    "      SELECT u, v FROM edges\n"
    "      UNION\n"
    "      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),\n"
    "    lbl AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u),")

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
    sf_dir, dump_dir, qname = sys.argv[1], sys.argv[2], sys.argv[3]
    oracles = json.load(open(os.path.join(dump_dir, "oracle_sql.json")))
    sql = oracles.get(qname) or oracles.get(qname + ".parquet")
    if sql is None:
        sys.exit(f"no oracle SQL for {qname}")
    if REACH_RE not in sql:
        sys.exit(f"{qname}: oracle does not contain the canonical "
                 "reach/lbl closure block — refusing to rewrite")

    con = duckdb.connect()
    con.execute(f"SET threads={int(os.environ.get('THREADS', '16'))}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # 1. materialize the edge set from the oracle's own prefix
    prefix = sql[:sql.index(REACH_RE)].rstrip().rstrip(",")
    con.execute(f"CREATE TABLE edges_t AS {prefix}\nSELECT u, v FROM edges")
    ne = con.execute("SELECT count(*) FROM edges_t").fetchone()[0]
    print(f"{qname}: {ne} edges", flush=True)

    # 2. semi-naive min-label propagation (labels include self, so the
    #    component-minimum node carries its own id — consumers take
    #    least(doc_id, mn), making this exactly the recorded labeling)
    con.execute("CREATE TABLE lblp AS "
                "SELECT u AS node, u AS l FROM edges_t "
                "UNION SELECT v, v FROM edges_t")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
        CREATE OR REPLACE TABLE nxt AS
          SELECT l.node, least(l.l, coalesce(min(nl.l), l.l)) AS l
          FROM lblp l
          LEFT JOIN edges_t e ON e.u = l.node
          LEFT JOIN lblp nl ON nl.node = e.v
          GROUP BY l.node, l.l""")
        changed = con.execute(
            "SELECT count(*) FROM nxt JOIN lblp USING (node) "
            "WHERE nxt.l <> lblp.l").fetchone()[0]
        con.execute("DROP TABLE lblp")
        con.execute("ALTER TABLE nxt RENAME TO lblp")
        print(f"round {rounds}: {changed} labels moved", flush=True)
        if changed == 0:
            break

    # 3. re-run the oracle with the closure block swapped for the table
    rewritten = sql.replace(
        REACH_RE, "lbl AS (SELECT node AS doc_id, l AS mn FROM lblp),")
    rel = con.sql(rewritten)
    ocols = [c[0] for c in rel.description]
    orows = rel.fetchall()

    drel = con.sql(
        f"SELECT * FROM '{os.path.join(dump_dir, qname)}.parquet/*.parquet'")
    dcols = [c[0] for c in drel.description]
    drows = drel.fetchall()
    ok_rows = len(orows) == len(drows)
    ok_schema = sorted(ocols) == sorted(dcols)
    ok_hash = ok_schema and table_hash(ocols, orows) == table_hash(dcols, drows)
    verdict = "OK        " if (ok_rows and ok_schema and ok_hash) else "FAIL"
    print(f"{qname:32s} {verdict} rows={len(drows)} (oracle {len(orows)}) "
          f"rows_match={ok_rows} schema_match={ok_schema} "
          f"hash_match={ok_hash} label_rounds={rounds}")
    sys.exit(0 if (ok_rows and ok_schema and ok_hash) else 1)


main()
