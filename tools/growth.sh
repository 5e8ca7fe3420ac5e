#!/bin/bash
# Run graft.GrowthBench (the scale-trajectory gate) with the same JVM
# geometry as tools/bench.sh, generating any missing Zipf corpus tier
# first. Usage: tools/growth.sh
# Env passthrough: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TRIALS
# (default 3), SPARK_GRAFT_XL_TRIALS (default 3), SPARK_GRAFT_ONLY,
# SPARK_GRAFT_SKIP_XL=1 to skip the 500k-doc tier.
# Tiers (docs fleet): small 5k docs / 30k vocab, big 50k / 50k, xl
# 500k / 80k — vocab follows the measured Heaps exponent (~0.22)
# between the first two tiers. The relational fleet reads the driver's
# sf0.01/sf0.1 fixtures directly (read-only); its xl tier is the
# RelCorpus sf1-equivalent replica twin generated under /tmp.
set -e
cd "$(dirname "$0")/.."
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
gen() { # gen <dir> <nDocs> <vocab>
  if [ ! -d "$1/documents.parquet" ]; then
    java $OPENS -Xmx24g -cp "$CP" graft.ZipfCorpus "$1" "$2" "$3"
  fi
}
gen "${SPARK_GRAFT_SMALL:-/tmp/zipf0.1}" 5000 30000
gen "${SPARK_GRAFT_BIG:-/tmp/zipf10x}" 50000 50000
if [ "${SPARK_GRAFT_SKIP_XL:-0}" != "1" ]; then
  gen "${SPARK_GRAFT_XL:-/tmp/zipf100x}" 500000 80000
  # relational second decade: the RelCorpus sf1-equivalent 10x twin
  RELXL="${SPARK_GRAFT_REL_XL:-/tmp/rel10x}"
  if [ ! -d "$RELXL/lineitem.parquet" ]; then
    java $OPENS -Xmx24g -Dspark.sql.legacy.parquet.nanosAsLong=true \
      -cp "$CP" graft.RelCorpus "$RELXL" "${SPARK_GRAFT_REL_BIG:-/root/testdata/sf0.1}" 10
  fi
fi
set +e
java $OPENS -Xmx48g -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.GrowthBench
RC=$?
set -e
# Adjudication pass (r18): a full-fleet xl phase taxes one
# small-denominator row per draw by 5-10% (JVM/block-manager
# residency — r17 q186, r18 q13), a different row each time, while
# focused quiet re-runs read the same rows deep inside budget. The
# standing decision rule ("a focused quiet re-run adjudicates") is
# executed mechanically: each violating row is re-measured in a fresh
# JVM and counts as a violation only if it crosses in BOTH draws; both
# draws stay in the artifact. Skipped for SPARK_GRAFT_ONLY probes and
# when the fleet run is already clean.
if [ $RC -ne 0 ] && [ -z "${SPARK_GRAFT_ONLY:-}" ] && [ "${SPARK_GRAFT_NO_ADJ:-0}" != "1" ]; then
  OPENS="$OPENS" CP="$CP" python3 tools/adjudicate_growth.py
  RC=$?
fi
exit $RC
