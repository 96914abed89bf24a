#!/bin/bash
# Run a graft main outside sbt (no sbt lock): tools/run_main.sh [-cp DIR] <mainClass> [args...]
# Mirrors build.sbt's forked-JVM flags (JDK17 add-opens + heap).
set -e
CLASSES="target/scala-2.13/classes"
if [ "$1" = "-cp" ]; then CLASSES="$2"; shift 2; fi
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
