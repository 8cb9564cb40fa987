#!/bin/bash
# Targeted idle-box bench probe (BASELINE.md adjudication protocol).
# Usage: tools/bench_only.sh <sfdir> <comma-separated-query-keys>
# Runs graft.Bench directly (no sbt) with the same JVM flags build.sbt
# injects, printing only the JSON result line.
set -euo pipefail
SF_DIR="${1:?sf dir}"; ONLY="${2:?query keys}"
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$ONLY" \
java -Xmx16g $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  2>/dev/null | grep '"metric"'
