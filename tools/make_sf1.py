#!/usr/bin/env python3
"""Scale-rehearsal fixture: replicate sf0.1 10x into /tmp/sf1 with
key-space offsets so join fan-outs stay TPC-H-shaped (each copy is a
disjoint key range; nation/region stay fixed like real TPC-H dims).
Documents get a copy-tag token PREPENDED to the text so shingle/minhash
surfaces don't see 10 exact clones of every doc (which would measure
quadratic pair blowup, a data artifact, not a plan property).
Embeddings replicate as-is: ANN gate query sets are absolute-id
subsets, so the rehearsal grows the CORPUS side only.

Usage: python3 tools/make_sf1.py [copies=10] [out=/tmp/sf1]
"""
import sys, os
import duckdb

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

# key-space strides (max+1 at sf0.1)
STRIDE = dict(l_orderkey=150000, o_orderkey=150000, l_partkey=20000,
              p_partkey=20000, l_suppkey=1000, s_suppkey=1000,
              c_custkey=15000, o_custkey=15000, event_id=100000,
              user_id=1500, doc_id=5000, vec_id=2000)

def gen(table, extra=None):
    src = f"{SRC}/{table}.parquet"
    out = f"{OUT}/{table}.parquet"
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    parts = []
    for c in range(COPIES):
        rep = [f"{k} + {c * STRIDE[k]} AS {k}" for k in cols if k in STRIDE]
        if extra:
            rep += [extra.format(c=c)]
        repl = (" REPLACE (" + ", ".join(rep) + ")") if rep else ""
        parts.append(f"SELECT *{repl} FROM '{src}'")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows")

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

for t in ("supplier", "part", "customer", "orders", "lineitem",
          "events", "embeddings"):
    gen(t)
gen("documents", extra="'c{c} ' || text AS text")
print("done ->", OUT)
