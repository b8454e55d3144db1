#!/bin/bash
# Builder-side micro-bench: time a comma-separated query subset at a given
# SF dir using the compiled classes directly (no sbt startup).
#   tools/qbench.sh q1_pricing,graph_kcore [sfdir] [passes]
set -e
export SPARK_GRAFT_BENCH_ONLY="$1"
export SPARK_GRAFT_SF_DIR="${2:-/root/testdata/sf0.1}"
export SPARK_GRAFT_BENCH_PASSES="${3:-3}"
export SPARK_GRAFT_BENCH_MAX_PASSES="${3:-3}"
export SPARK_GRAFT_BENCH_DETAIL="/tmp/qbench_detail.json"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
exec java -Xmx100g \
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
  -cp "$CP" \
  -DSPARK_LOCAL_IP=127.0.0.1 \
  graft.Bench 2>/dev/null
