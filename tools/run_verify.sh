#!/bin/sh
# spark-submit runner for graft.Verify: dumps every SparkEntry query to
# <outDir>/<name>.parquet plus oracle_sql.json for the DuckDB compare.
# Usage: tools/run_verify.sh <sfDir> <outDir>
set -e
cd "$(dirname "$0")/.."
MEM="${SPARK_DRIVER_MEM:-20g}"
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --driver-memory "$MEM" \
  --conf "spark.driver.extraJavaOptions=-Xms$MEM -XX:+AlwaysPreTouch" \
  --class graft.Verify \
  --driver-class-path target/scala-2.13/classes \
  target/scala-2.13/classes "$@"
