#!/usr/bin/env bash
# Launch the graft daemon from the packaged library jar — no hand-assembled
# classpath (r9 verdict residual #3). `make daemon-assembly` builds the jar;
# this script supplies everything else:
#
#   tools/graft-daemon.sh [config.yaml] [envPrefix] [port]
#
#   SPARK_JARS_DIR   Spark runtime jars   (default /opt/spark/jars)
#   GRAFT_EXTRA_JARS directory of broker client jars — amqp-client,
#                    mongo-spark-connector — for live endpoints; without it
#                    the daemon still runs and the broker bindings fail fast
#                    with their --packages coordinates (ChangeStreamJob)
#   SPARK_DRIVER_MEM heap (default 8g)
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
JAR="$ROOT/target/scala-2.13/mrcondspark_2.13-0.1.0.jar"
[ -f "$JAR" ] || { echo "library jar missing — run: make daemon-assembly" >&2; exit 1; }
CP="$JAR:${SPARK_JARS_DIR:-/opt/spark/jars}/*"
[ -n "${GRAFT_EXTRA_JARS:-}" ] && CP="$CP:$GRAFT_EXTRA_JARS/*"
# JDK 17 module opens Spark needs outside spark-submit — same list as
# build.sbt (org.apache.spark.launcher.JavaModuleOptions)
OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${OPENS[@]}" -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.streaming.GraftDaemon "$@"
