#!/bin/bash
# Run graft.Bench directly on the compiled classes with the same JVM
# geometry as the sbt fork (build.sbt javaOptions): 48g heap, 512m
# reserved code cache, UTC, UI off. Usage: tools/bench.sh [sfDir]
# Env passthrough: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TRIALS
# (default 4), SPARK_GRAFT_ONLY.
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR=${1:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx48g -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
