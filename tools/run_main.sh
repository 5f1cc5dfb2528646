#!/bin/bash
# Run a graft main class against the compiled classes WITHOUT holding the
# sbt lock (sbt's target/ is shared; two sbt commands can't run at once,
# but a long background run — the sf1 sweep — shouldn't block iteration).
# Usage: tools/run_main.sh <mainClass> [args...]   (env passes through)
# Requires a prior `sbt compile` (does not compile anything itself).
# scala-library ships in /opt/spark/jars, so the classpath is just
# classes + the Spark jar dir.
set -euo pipefail
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$@"
