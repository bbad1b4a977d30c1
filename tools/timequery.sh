#!/bin/bash
# Direct-java TimeQuery runner: fresh JVM per invocation, no sbt startup.
# Usage: tools/timequery.sh <tree-root> <query> [sfDir] [passes]
# Mirrors build.sbt's javaOptions (add-opens, UTC, no UI, 8g heap).
set -euo pipefail
ROOT="$1"; Q="$2"; SF="${3:-/root/testdata/sf0.1}"; PASSES="${4:-3}"
CP="$ROOT/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx8g -cp "$CP" graft.TimeQuery "$Q" "$SF" "$PASSES"
