#!/bin/bash
# Run a graft main class directly (no sbt project lock), e.g.:
#   sbt -batch "export Runtime/fullClasspath" | grep '^/' | tail -1 > /tmp/cp.txt
#   tools/runmain.sh graft.Bench
# JDK17 --add-opens flags mirror build.sbt.
CP=$(cat /tmp/cp.txt 2>/dev/null)
[ -z "$CP" ] && { echo "export classpath to /tmp/cp.txt first" >&2; exit 1; }
exec java -cp "$CP" \
  --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g \
  -XX:G1HeapRegionSize=32m "$@"
