#!/bin/bash
# Run a graft main class from compiled classes without sbt (avoids the
# sbt lock and the compile-during-run pitfall). Usage:
#   tools/jrun.sh [-cp <classes>] [-Xmx<heap>] <mainClass> [args...]
# Env vars (SPARK_GRAFT_*) pass through.
CP_CLASSES=/root/repo/target/scala-2.13/classes
HEAP=-Xmx8g
while [[ "$1" == -* ]]; do
  case "$1" in
    -cp) CP_CLASSES="$2"; shift 2;;
    -Xmx*) HEAP="$1"; shift;;
    *) break;;
  esac
done
DUCKDB_JAR=$(find /root/.cache/coursier -name "duckdb_jdbc-*.jar" 2>/dev/null | head -1)
exec java $HEAP \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP_CLASSES:$DUCKDB_JAR:/opt/spark/jars/*" "$@"
