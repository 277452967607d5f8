#!/usr/bin/env python
"""Scale-up testdata generator: build sfN as N key-remapped copies of
/root/testdata/sf0.1 (the r4 verdict's sf1 dress-rehearsal ask).

Driver testdata is read-only, so the scaled set lives under
``.localdata/`` (gitignored).  Each copy ``i``:

- offsets every key column by ``i × stride`` (stride = max(key)+1 per
  key domain, computed from the data) so FK relationships stay valid
  and distinct counts scale linearly;
- ROTATES document word order and embedding vectors by a copy-dependent
  amount — copies must NOT be exact or near duplicates of each other,
  or the dedup/ANN tier would see a superlinear candidate-pair blow-up
  that says nothing about real scaling (10 identical corpora is a
  degenerate workload, not a bigger one);
- keeps the events time span (10× daily density, same window count) —
  the realistic shape for a busier stream.

Usage: python tools/make_sfn.py [factor] [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = (
    sys.argv[3]
    if len(sys.argv) > 3
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".localdata", "sf1")
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 4}")

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    def stride(table: str, col: str) -> int:
        return int(con.sql(f"SELECT max({col}) + 1 FROM {src(table)}").fetchone()[0])

    cust = stride("customer", "c_custkey")
    supp = stride("supplier", "s_suppkey")
    part = stride("part", "p_partkey")
    ordk = stride("orders", "o_orderkey")
    evid = stride("events", "event_id")
    user = stride("events", "user_id")
    doc = stride("documents", "doc_id")
    vec = stride("embeddings", "vec_id")

    copies = f"(SELECT unnest(range({FACTOR})) AS i) c"

    jobs = {
        # fixed dims: copy as-is
        "region": f"SELECT * FROM {src('region')}",
        "nation": f"SELECT * FROM {src('nation')}",
        "customer": f"""
            SELECT c_custkey + i*{cust} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')}, {copies}""",
        "supplier": f"""
            SELECT s_suppkey + i*{supp} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {src('supplier')}, {copies}""",
        "part": f"""
            SELECT p_partkey + i*{part} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM {src('part')}, {copies}""",
        "orders": f"""
            SELECT o_orderkey + i*{ordk} AS o_orderkey,
                   o_custkey + i*{cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {copies}""",
        "lineitem": f"""
            SELECT l_orderkey + i*{ordk} AS l_orderkey,
                   l_partkey + i*{part} AS l_partkey,
                   l_suppkey + i*{supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {copies}""",
        "events": f"""
            SELECT event_id + i*{evid} AS event_id, ts,
                   user_id + i*{user} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {copies}""",
        # per-copy VOCABULARY REMAP (w -> w + 'q' + i for copies i > 0):
        # cross-copy shingle overlap is exactly zero, while WITHIN each
        # copy the n-gram structure (hot-shingle dfs, dup clusters, length
        # distribution) mirrors the original corpus — so posting-list
        # fan-out scales exactly linearly in the copy count.  Two rejected
        # alternatives, both measured as degenerate: word ROTATION
        # preserves cyclic n-grams (copies become near-perfect Jaccard
        # duplicates → 100× pair blow-up), and a hash SCRAMBLE turns text
        # into stopword soup whose common-word trigrams collide across
        # thousands of docs (max shingle df 25 → 144, pair fan-out
        # 1.27M → 125M).
        "documents": f"""
            SELECT doc_id, text, lang, source, n_chars FROM {src('documents')}
            UNION ALL
            SELECT doc_id + i*{doc} AS doc_id,
                   array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> w || 'q' || i::VARCHAR),
                     ' ') AS text,
                   lang, source, n_chars
            FROM {src('documents')},
                 (SELECT unnest(range(1, {FACTOR})) AS i) c""",
        # vector rotation per copy: norms and coordinate distributions are
        # preserved, directions are not — copies are not mutual neighbors
        "embeddings": f"""
            SELECT vec_id + i*{vec} AS vec_id,
                   CASE WHEN i = 0 OR len(embedding) < 2 THEN embedding
                        ELSE list_concat(embedding[(1 + (i % len(embedding))):],
                                         embedding[1:(i % len(embedding))])::FLOAT[]
                   END AS embedding,
                   label
            FROM {src('embeddings')}, {copies}""",
    }

    for table, q in jobs.items():
        out = os.path.join(OUT, f"{table}.parquet")
        con.sql(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
