#!/bin/bash
# Local emulation of the driver's bench lane: run graft.Bench at one SF
# and save the one-line JSON. Extra args restrict to those query names.
# Usage: tools/bench_local.sh <sfdir> <out.json> [query ...]
set -u
SFDIR="$1"; OUT="$2"; shift 2
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':' | sed 's/:$//')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS="${SPARK_GRAFT_BENCH_RUNS:-3}" \
SPARK_GRAFT_BENCH_BUDGET="${SPARK_GRAFT_BENCH_BUDGET:-1800}" \
  java $OPENS -Xmx16g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench "$@" > "$OUT" 2>/tmp/bench_stderr_$(basename "$OUT" .json).log
echo "exit=$? -> $OUT"
