#!/usr/bin/env python3
"""Dedup-family-only scale builder (harness-side only).

Same replica transform as make_sf_scale.py (per-replica token suffix
for documents, circular embedding rotation — decorrelated content,
dup structure preserved WITHIN each replica) but builds ONLY the
documents and embeddings tables, so an sf10 (N=100) rehearsal of the
dedup/LSH family (q41/q42/q46/q47/q51 via graft.LshAudit) doesn't pay
for 60M lineitem rows it never reads.

Usage: python3 scripts/make_sf_dedup.py [N] [outdir]
"""
import pathlib
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10_dedup"
SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000_000

facts = {"documents": ["doc_id"], "embeddings": ["vec_id"]}

def perturb(table, col, i):
    if i == 0:
        return col
    if table == "documents" and col == "text":
        return f"regexp_replace({col}, '(\\w+)', '\\1r{i}', 'g') AS {col}"
    if table == "embeddings" and col == "embedding":
        return (f"(list_slice({col}, {i + 1}, len({col})) || "
                f"list_slice({col}, 1, {i})) AS {col}")
    return col

con = duckdb.connect()
pathlib.Path(OUT).mkdir(parents=True, exist_ok=True)
for t, keys in facts.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
    selects = []
    for i in range(N):
        proj = ", ".join(
            f"{c} + {i * SHIFT} AS {c}" if c in keys else perturb(t, c, i)
            for c in cols)
        selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
    union = " UNION ALL ".join(selects)
    con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({N}x)")
print("done ->", OUT)
