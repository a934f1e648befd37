#!/bin/bash
# Run a graft main class with the same JVM options build.sbt injects,
# without taking the sbt build lock (so long sweeps and parity runs can
# overlap). Usage:
#   SPARK_DRIVER_MEM=32g tools/run_main.sh graft.Scale [args...]
# Requires `sbt compile` to have produced target/scala-2.13/classes.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dderby.system.home=/tmp/graft_derby \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$@"
