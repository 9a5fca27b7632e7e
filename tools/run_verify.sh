#!/bin/sh
# spark-submit runner for graft.Verify: dumps every SparkEntry query to
# <outDir>/<name>.parquet plus oracle_sql.json for the DuckDB compare.
# Usage: tools/run_verify.sh [sfDir] [outDir]
#   defaults: sfDir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01,
#             outDir=$SPARK_GRAFT_VERIFY_OUT or ./verify_out
# Self-sufficient from a cold checkout: compiles first if classes are absent.
set -e
cd "$(dirname "$0")/.."
[ -f target/scala-2.13/classes/graft/Verify.class ] || sbt -batch compile 1>&2
MEM="${SPARK_DRIVER_MEM:-20g}"
exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --driver-memory "$MEM" \
  --conf "spark.driver.extraJavaOptions=-Xms$MEM -XX:+AlwaysPreTouch" \
  --class graft.Verify \
  --driver-class-path target/scala-2.13/classes \
  target/scala-2.13/classes "$@"
