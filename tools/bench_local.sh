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
# stage to a temp file and publish only on success, so a failed java
# run can neither leave a truncated $OUT that looks like a valid
# artifact nor hide its failure behind the trailing echo's exit 0
TMP_OUT="$(mktemp "${OUT}.XXXXXX")"
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS="${SPARK_GRAFT_BENCH_RUNS:-3}" \
SPARK_GRAFT_BENCH_BUDGET="${SPARK_GRAFT_BENCH_BUDGET:-1800}" \
  java $OPENS -Xmx16g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench "$@" > "$TMP_OUT" 2>/tmp/bench_stderr_$(basename "$OUT" .json).log
rc=$?
if [ "$rc" -eq 0 ]; then
  mv "$TMP_OUT" "$OUT"
else
  rm -f "$TMP_OUT"
fi
echo "exit=$rc -> $OUT"
exit $rc
