#!/bin/bash
# Direct-JVM runner for graft entry points (Verify, Bench, TimeQ...)
# without sbt startup or the sbt target-dir lock. Usage:
#   tools/run_graft.sh graft.Verify /root/testdata/sf0.001 /tmp/vout [query...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS etc pass through.
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=1g \
  -cp "$CP" "$@"
