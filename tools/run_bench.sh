#!/bin/sh
# spark-submit runner for graft.Bench (the north rule's invocation mode).
# Prints ONE bare JSON line as the final stdout line AND writes it to
# ./BENCH.json (override with SPARK_GRAFT_BENCH_OUT).
# JVM flags mirror build.sbt's forked-run options: a fixed, pre-touched heap
# — this sandbox's nested paging makes lazy heap growth serialize on the
# mmap lock and destroys multi-core scaling (see BASELINE.md).
#
# Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ROWS,
#      SPARK_GRAFT_BENCH_REPS, SPARK_GRAFT_BENCH_OUT, SPARK_DRIVER_MEM.
# Self-sufficient from a cold checkout: compiles first if classes are absent.
set -e
cd "$(dirname "$0")/.."
[ -f target/scala-2.13/classes/graft/Bench.class ] || sbt -batch compile 1>&2
MEM="${SPARK_DRIVER_MEM:-20g}"
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --driver-memory "$MEM" \
  --conf "spark.driver.extraJavaOptions=-Xms$MEM -XX:+AlwaysPreTouch" \
  --class graft.Bench \
  --driver-class-path target/scala-2.13/classes \
  target/scala-2.13/classes "$@"
