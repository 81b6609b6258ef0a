#!/bin/bash
# Run a graft main class directly on the compiled classes (skips sbt startup).
# Usage: tools/jrun.sh <MainClass> [args...]
# Env: JMEM (default 8g) heap size.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS --add-modules=jdk.incubator.vector \
  -Xmx"${JMEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*" "$@"
