#!/bin/bash
# Round-19 composed-query differential fuzz: graft.tools.QueryFuzz
# generates seeded agg/join/window/fill/setop/limit-by/scalar query
# PAIRS (CH-dialect Spark text + ANSI DuckDB text), executes the Spark
# side, and scripts/compare.py replays the DuckDB side over the same
# parquet tables. Usage: query_fuzz.sh [sf_dir] [out_dir] [n] [seed]
set -e
cd /root/repo
SF_DIR=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_queryfuzz}
N=${3:-128}
SEED=${4:-19}
rm -rf "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.QueryFuzz "$SF_DIR" "$OUT" "$N" "$SEED" 2>/tmp/graft_queryfuzz_stderr.log \
  || { tail -30 /tmp/graft_queryfuzz_stderr.log; exit 1; }
grep -E "\[fuzz\]" /tmp/graft_queryfuzz_stderr.log || true
python3 scripts/compare.py "$SF_DIR" "$OUT"
