#!/usr/bin/env python3
"""q129 oracle at LARGE scale: iterative min-label propagation in DuckDB.

The recorded q129 oracle (Oracles.clusterStore) closes the duplicate graph
with a recursive CTE computing the full REACHABILITY relation — O(sum of
cluster_size^2) rows. Fine at sf0.01/sf0.1; at sf1 the planted three-batch
corpus produces a giant LSH component and the closure is impractical
(>8 CPU-hours, unfinished). This tool computes the SAME labeling (component
= min reachable doc_id) by semi-naive min-label propagation: each round is
one edges-join (O(E) work), converging in O(component diameter) rounds —
the textbook equivalence the engine's own large-star/small-star CC relies
on. It then hash-compares the Spark dump exactly like tools/compare.py
(columns sorted by name, same value canonicalization).

Usage: python3 tools/cc_label_oracle.py <sfDir> <dump.parquet dir>
"""
import sys
import duckdb

sf, dump = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# accept both a single parquet file and a Spark-written table directory
# (the ScaleData sf1 layout) — same dispatch as tools/compare.py
import os  # noqa: E402
p = f"{sf}/documents.parquet"
src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
con.execute(f"CREATE VIEW documents AS SELECT * FROM {src}")

NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
TOKS = f"string_split({NORM}, ' ')"
BIGRAMS = (f"list_transform(generate_series(1, len({TOKS}) - 1),"
           f" i -> concat_ws(' ', {TOKS}[i], {TOKS}[i + 1]))")
H60 = "CAST(concat('0x', substr(md5(sh), 1, 15)) AS BIGINT)"

con.execute(f"""
CREATE TABLE corpus AS
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), text
  FROM documents
  UNION ALL
  SELECT doc_id + 2 * (SELECT max(doc_id) + 1 FROM documents),
         text || ' qz17 qz18' AS text
  FROM documents""")

con.execute(f"""
CREATE TABLE edges AS
WITH g AS (
  SELECT doc_id, unnest(list_distinct({BIGRAMS})) AS sh FROM corpus),
h AS (SELECT doc_id, mod({H60}, 1000000007) AS hh FROM g),
sigs AS (
  SELECT doc_id,
         min(mod(hh *  2000007 + 777767777, 1000000007)) AS mh0,
         min(mod(hh *  4000013 + 555535547, 1000000007)) AS mh1,
         min(mod(hh *  6000019 + 333303317, 1000000007)) AS mh2,
         min(mod(hh *  8000025 + 111071087, 1000000007)) AS mh3,
         min(mod(hh * 10000031 + 888838864, 1000000007)) AS mh4,
         min(mod(hh * 12000037 + 666606634, 1000000007)) AS mh5,
         min(mod(hh * 14000043 + 444374404, 1000000007)) AS mh6,
         min(mod(hh * 16000049 + 222142174, 1000000007)) AS mh7
  FROM h GROUP BY doc_id),
banded AS (
  SELECT doc_id, 0 AS band, md5(concat_ws(',', mh0, mh1)) AS sig FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band, md5(concat_ws(',', mh2, mh3)) AS sig FROM sigs
  UNION ALL
  SELECT doc_id, 2 AS band, md5(concat_ws(',', mh4, mh5)) AS sig FROM sigs
  UNION ALL
  SELECT doc_id, 3 AS band, md5(concat_ws(',', mh6, mh7)) AS sig FROM sigs),
pairs AS (
  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
SELECT u, v FROM pairs UNION SELECT v, u FROM pairs""")

con.execute("""
CREATE TABLE lbl AS SELECT doc_id AS node, doc_id AS l FROM corpus""")

rounds = 0
while True:
    rounds += 1
    con.execute("""
    CREATE OR REPLACE TABLE nxt AS
      SELECT l.node, least(l.l, coalesce(min(nl.l), l.l)) AS l
      FROM lbl l
      LEFT JOIN edges e ON e.u = l.node
      LEFT JOIN lbl nl ON nl.node = e.v
      GROUP BY l.node, l.l""")
    changed = con.execute(
        "SELECT count(*) FROM nxt JOIN lbl USING (node) "
        "WHERE nxt.l <> lbl.l").fetchone()[0]
    con.execute("DROP TABLE lbl")
    con.execute("ALTER TABLE nxt RENAME TO lbl")
    print(f"round {rounds}: {changed} labels moved", flush=True)
    if changed == 0:
        break

rel = con.sql("""
  SELECT c.doc_id, l.l AS cluster_id,
         count(*) OVER (PARTITION BY l.l) AS cluster_size
  FROM corpus c JOIN lbl l ON l.node = c.doc_id
  ORDER BY doc_id""")

# hash-compare exactly like tools/compare.py (canon/table_hash inlined —
# compare.py is a script whose main runs on import)
import hashlib  # noqa: E402


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


ocols = [c[0] for c in rel.description]
orows = rel.fetchall()
drel = con.sql(f"SELECT * FROM '{dump}/*.parquet'")
dcols = [c[0] for c in drel.description]
drows = drel.fetchall()
ok_rows = len(orows) == len(drows)
ok_schema = sorted(ocols) == sorted(dcols)
ok_hash = table_hash(ocols, orows) == table_hash(dcols, drows)
print(f"rows={len(drows)} (oracle {len(orows)}) rows_match={ok_rows} "
      f"schema_match={ok_schema} hash_match={ok_hash} "
      f"label_rounds={rounds}")
sys.exit(0 if (ok_rows and ok_schema and ok_hash) else 1)
