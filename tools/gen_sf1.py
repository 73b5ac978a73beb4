#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 test data -> a local
"sf1" directory, for the SCALING axis the sf0.1 bench cannot see (VERDICT
r14 item 5: at sf0.1 every 8-vs-32-core ratio is ~1 because fixtures and
per-job overhead dominate).

Construction (pure SQL over the read-only source, no randomness):
  - fact/dim tables scale by UNION ALL of 10 key-shifted copies; every
    join key shifts by the same per-copy offset (copy i adds i * SPAN_k
    to key family k), so FK joins (orders-customer, lineitem-orders/part/
    supplier, documents-embeddings) keep exactly the source's join
    fan-out. SPAN_k = max(key)+1 of the source, a pure function of the
    input.
  - nation/region stay as-is (bounded dims; nationkeys are never shifted).
  - value/text/timestamp columns copy verbatim: the scale-up multiplies
    cardinality, not value ranges.

Usage: python3 tools/gen_sf1.py [out_dir]   (default /root/sf1)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1"
COPIES = 10

con = duckdb.connect()

def span(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

SPAN_ORDER = span("orders", "o_orderkey")
SPAN_CUST = span("customer", "c_custkey")
SPAN_PART = span("part", "p_partkey")
SPAN_SUPP = span("supplier", "s_suppkey")
SPAN_DOC = max(span("documents", "doc_id"), span("embeddings", "vec_id"))
SPAN_EVT = span("events", "event_id")
SPAN_USER = span("events", "user_id")

# per-table: (shifted_cols -> span, passthrough template)
SHIFTS = {
    "customer": {"c_custkey": SPAN_CUST},
    "supplier": {"s_suppkey": SPAN_SUPP},
    "part": {"p_partkey": SPAN_PART},
    "orders": {"o_orderkey": SPAN_ORDER, "o_custkey": SPAN_CUST},
    "lineitem": {"l_orderkey": SPAN_ORDER, "l_partkey": SPAN_PART,
                 "l_suppkey": SPAN_SUPP},
    "documents": {"doc_id": SPAN_DOC},
    "embeddings": {"vec_id": SPAN_DOC},
    "events": {"event_id": SPAN_EVT, "user_id": SPAN_USER},
}

os.makedirs(OUT, exist_ok=True)

for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied verbatim")

for t, shifts in SHIFTS.items():
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
    arms = []
    for i in range(COPIES):
        sel = ", ".join(
            f"({c} + {i * shifts[c]}) AS {c}" if c in shifts else c
            for c in cols)
        arms.append(f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(arms)}) TO '{OUT}/{t}.parquet' "
                f"(FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({COPIES}x)")

print(f"done -> {OUT}")
