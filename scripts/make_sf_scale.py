#!/usr/bin/env python3
"""Scale-rehearsal data builder (harness-side only).

Builds an sf1-equivalent dataset in /tmp by replicating the sf0.1 fact
tables N times with shifted primary keys (FKs to dimension tables keep
their values, so join fan-in grows like a real scale-up; dims copy
as-is). Perf rehearsal only — correctness stays pinned to the driver's
own sf dirs.

Replica CONTENT is decorrelated, not copied verbatim: every document
token gets a per-replica suffix (disjoint shingle/minhash space across
replicas, duplicate structure preserved WITHIN each replica) and every
embedding is circularly rotated by the replica index (rotations of a
vector are generally dissimilar, norms/dims unchanged). Verbatim
copies made every near-dup/LSH bucket hold N exact clones, so
candidate pairs grew ~quadratically — an artifact of the generator,
not the plans (round-9 rehearsal). A real 10x corpus is mostly NEW
content with the same internal dup rate; this models that, so the
near-dup family should now scale ~linearly and a superlinear bench is
a genuine plan defect.

Usage: python3 scripts/make_sf_scale.py [N] [outdir]
"""
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000_000  # key shift per replica, far above any base key

copy_asis = ["region", "nation", "customer", "supplier", "part"]
# fact table -> (key columns to shift, timestamp column to jitter)
facts = {
    "orders": (["o_orderkey"], None),
    "lineitem": (["l_orderkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
}

con = duckdb.connect()
import pathlib
pathlib.Path(OUT).mkdir(parents=True, exist_ok=True)

EMB_DIM = con.execute(
    f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1").fetchone()[0]

for t in copy_asis:
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: copied")

def perturb(table, col, i):
    """Replica-i content transform (replica 0 stays verbatim)."""
    if i == 0:
        return col
    if table == "documents" and col == "text":
        # suffix every token: shingles/minhashes disjoint across
        # replicas, dup structure within a replica untouched
        return f"regexp_replace({col}, '(\\w+)', '\\1r{i}', 'g') AS {col}"
    if table == "embeddings" and col == "embedding":
        # circular rotation by replica index: same dim and norm,
        # generally dissimilar direction. The rotation index wraps at
        # the corpus dim (64), so replicas >= dim would EXACTLY clone
        # replicas i-dim (the round-12 sf10 rehearsal surfaced 1.3M
        # spurious verified pairs this way); past one full cycle the
        # vector is additionally negated — cos(v, -rot(v)) = -cos,
        # never a near-dup — giving 2*dim distinct transforms. Past
        # 2*dim replicas (the sf100 rehearsal), each replica further
        # applies a deterministic per-replica ±1 SIGN MASK (seeded
        # from the replica index): norm and dims unchanged, and two
        # replicas sharing a rotation now differ in ~half their signs
        # — expected cosine ~0, so cross-replica pairs stay out of
        # every near-dup family.
        r = i % EMB_DIM
        rot = (f"(list_slice({col}, {r + 1}, len({col})) || "
               f"list_slice({col}, 1, {r}))")
        if EMB_DIM <= i < 2 * EMB_DIM:
            rot = f"list_transform({rot}, x -> -x)"
        elif i >= 2 * EMB_DIM:
            import random
            rng = random.Random(0xE5CA1E + i)
            mask = [rng.choice((-1.0, 1.0)) for _ in range(EMB_DIM)]
            mask_sql = "[" + ", ".join(str(m) for m in mask) + "]"
            # cast back to FLOAT: the mask literal is DOUBLE and the
            # product would silently widen the column type, changing
            # the unioned table's schema vs the small SFs
            rot = (f"list_transform(list_zip({rot}, {mask_sql}), "
                   f"p -> CAST(p[1] * p[2] AS FLOAT))")
        return f"{rot} AS {col}"
    return col

for t, (keys, _) in facts.items():
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
    selects = []
    for i in range(N):
        proj = ", ".join(
            f"{c} + {i * SHIFT} AS {c}" if c in keys else perturb(t, c, i)
            for c in cols)
        selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
    # A single N-way UNION ALL trips DuckDB's expression-depth limit
    # past ~1000 replicas; chunk into part-files inside a `t.parquet/`
    # DIRECTORY (Spark and DuckDB both read it transparently). Single
    # file is kept for small N so the sf10 harness output is unchanged.
    CHUNK = 100
    # a previous run may have left this target as a file OR a chunk
    # directory (possibly with MORE parts than this N writes) — stale
    # parts would silently inflate the corpus, so always start clean
    tgt = pathlib.Path(OUT) / f"{t}.parquet"
    if tgt.is_dir():
        import shutil
        shutil.rmtree(tgt)
    elif tgt.exists():
        tgt.unlink()
    if N <= CHUNK:
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    else:
        d = tgt
        d.mkdir(parents=True, exist_ok=True)
        for j in range(0, N, CHUNK):
            union = " UNION ALL ".join(selects[j:j + CHUNK])
            con.execute(
                f"COPY ({union}) TO '{d}/part_{j:05d}.parquet' (FORMAT parquet)")
            print(f"  {t}: replicas {j}..{min(j + CHUNK, N) - 1} written", flush=True)
        n = con.execute(
            f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({N}x)", flush=True)
print("done ->", OUT)
