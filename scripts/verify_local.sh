#!/bin/bash
# Local mirror of the driver's t2 correctness gate:
#   Verify.scala at sf0.01 -> parquet per query + oracle_sql.json,
#   then DuckDB replays each oracle and compares.
set -e
cd /root/repo
SF_DIR=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_verify}
FILTER="${@:3}"
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
  graft.Verify "$SF_DIR" "$OUT" $FILTER 2>/tmp/graft_verify_stderr.log \
  || { tail -30 /tmp/graft_verify_stderr.log; exit 1; }
grep -E "\[verify\]" /tmp/graft_verify_stderr.log || true
python3 scripts/compare.py "$SF_DIR" "$OUT"
