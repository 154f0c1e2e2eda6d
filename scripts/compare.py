#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Loads each query's Spark parquet output and the oracle SQL, runs the
oracle in DuckDB over the same sf parquet tables, sorts columns by
name, and compares values (exact; floats exact too since both sides
round). Prints one line per query.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: spark output missing")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        srows = [tuple(norm_cell(v) for v in r)
                 for r in sdf[s_cols].itertuples(index=False)]
        orows = [tuple(norm_cell(v) for v in r)
                 for r in odf[o_cols].itertuples(index=False)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
        # also check order-insensitively to distinguish sort vs value bugs
        if bad:
            if sorted(srows) == sorted(orows):
                print(f"FAIL {name}: values match but ROW ORDER differs "
                      f"(first diff row {bad[0][0]})")
            else:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; "
                      f"row {i}:\n  spark ={a}\n  oracle={b}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
            n_ok += 1
    missing_oracle = [d.name for d in Path(out_dir).iterdir()
                      if d.is_dir() and d.name not in oracle]
    for name in sorted(missing_oracle):
        try:
            n = con.execute(f"SELECT count(*) FROM '{Path(out_dir)/name}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: no oracle, {n} rows")
        except Exception as e:
            print(f"FAIL {name}: rows-only check failed: {e}")
    print(f"== {n_ok} ok, {n_fail} fail, {len(missing_oracle)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
