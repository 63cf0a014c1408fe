#!/bin/bash
# Dev-loop runner: like run_main.sh but prepends the shadow-compiled
# classes in /tmp/optc so modified operators can be driven while sbt's
# lock is held by a long test run. Usage: tools/run_shadow.sh <mainClass> [args...]
set -euo pipefail
CLS="$1"; shift
: "${SPARK_GRAFT_CPUS:=32}"
export SPARK_GRAFT_CPUS
exec java -Xmx96g -XX:ReservedCodeCacheSize=1g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dderby.system.home=/tmp/derby \
  -cp "/tmp/optc:/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLS" "$@"
