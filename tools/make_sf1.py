#!/usr/bin/env python3
"""DEV-ONLY sf1 scale-stress generator (not part of the engine).

Builds a 10x corpus at /tmp/sf1 from /root/testdata/sf0.1 for the
round's scale measurements (PLANS.md "sf1"): fact tables x10 with
key offsets; dimensions copied as-is (dims grow slower than facts).

Copy semantics per fact table, chosen so relation growth matches a
REAL corpus scale-up (near-dup rate roughly constant) while still
planting clone mass:
  - copy 0: the original rows;
  - copy 1: EXACT clones (every doc/vector gains one duplicate ->
    clone clusters exist corpus-wide, the dedup stress);
  - copies 2-9: decorrelated content - documents get per-copy
    token prefixes (no shared shingles with other copies), embedding
    vectors mix with a per-copy deterministic pseudo-random unit
    vector (cosine to the source ~0.3 < the 0.45 near-dup
    threshold). Without decorrelation every pair family would grow
    ~100x (clone-squared), which models a DIFFERENT corpus than
    "10x the data".

Usage: python3 tools/make_sf1.py [/tmp/sf1]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("PRAGMA threads=16")

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

# dimensions: unchanged
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet'")
    print("dim ", t, con.execute(f"SELECT count(*) FROM {src(t)}").fetchone()[0])

# key offsets: max key + 1 per copy keeps ids disjoint
def off(t, key):
    return con.execute(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]

d_off = off("documents", "doc_id")
con.execute(f"""
COPY (
  SELECT d.doc_id + c.k * {d_off} AS doc_id,
    CASE WHEN c.k <= 1 THEN d.text
         ELSE array_to_string(
           [concat('c', c.k, w) for w in
            string_split_regex(trim(coalesce(d.text, '')), '[ \t\n\x0B\f\r]+')
            if w != ''], ' ')
    END AS text,
    d.lang, d.source, d.n_chars
  FROM {src('documents')} d CROSS JOIN range({COPIES}) c(k)
) TO '{DST}/documents.parquet'""")

v_off = off("embeddings", "vec_id")
# per-copy deterministic pseudo-random direction r (hash-driven),
# v' = normalize(0.35*v + r): cos(v, v') ~ 0.3..0.4 on 64-dim
con.execute(f"""
COPY (
  WITH pert AS (
    SELECT e.vec_id, e.embedding, e.label, c.k
    FROM {src('embeddings')} e CROSS JOIN range(2, {COPIES}) c(k)),
  ex AS (
    SELECT p.vec_id, p.k, p.label, u.i,
      0.35 * u.x
        + (CAST(hash(p.vec_id * 97 + p.k * 131 + u.i) % 2000001 AS DOUBLE)
           / 1000000.0 - 1.0) AS x
    FROM pert p, LATERAL (
      SELECT unnest(embedding) AS x,
        generate_subscripts(embedding, 1) AS i) u),
  nrm AS (
    SELECT vec_id, k, sqrt(sum(x * x)) AS n
    FROM ex GROUP BY vec_id, k),
  mixed AS (
    SELECT ex.vec_id, ex.k, max(ex.label) AS label,
      list(CAST(x / n AS FLOAT) ORDER BY i) AS embedding
    FROM ex JOIN nrm USING (vec_id, k) GROUP BY ex.vec_id, ex.k)
  SELECT vec_id + k * {v_off} AS vec_id, embedding, label FROM mixed
  UNION ALL
  SELECT e.vec_id + c.k * {v_off} AS vec_id, e.embedding, e.label
  FROM {src('embeddings')} e CROSS JOIN range(2) c(k)
) TO '{DST}/embeddings.parquet'""")

e_off = off("events", "event_id")
con.execute(f"""
COPY (
  SELECT e.event_id + c.k * {e_off} AS event_id, e.ts,
    e.user_id, e.event_type, e.value, e.props
  FROM {src('events')} e CROSS JOIN range({COPIES}) c(k)
) TO '{DST}/events.parquet'""")

o_off = off("orders", "o_orderkey")
con.execute(f"""
COPY (
  SELECT o.o_orderkey + c.k * {o_off} AS o_orderkey, o.o_custkey,
    o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority
  FROM {src('orders')} o CROSS JOIN range({COPIES}) c(k)
) TO '{DST}/orders.parquet'""")

con.execute(f"""
COPY (
  SELECT l.l_orderkey + c.k * {o_off} AS l_orderkey, l.l_partkey,
    l.l_suppkey, l.l_linenumber, l.l_quantity, l.l_extendedprice,
    l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM {src('lineitem')} l CROSS JOIN range({COPIES}) c(k)
) TO '{DST}/lineitem.parquet'""")

for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print("fact", t, n)
print("sf1 at", DST)
