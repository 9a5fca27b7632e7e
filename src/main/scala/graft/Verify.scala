package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Invocation-proof by design (the round-1 correctness artifact came back
  * empty because of a handshake failure, not wrong answers): args are
  * optional with env/default fallbacks, oracle_sql.json is written FIRST
  * (before any query can fail), each query's stale output is deleted before
  * it runs (a failure must not leave a previous run's parquet to be compared
  * as if fresh), and the final stdout line is a bare JSON summary.
  *
  *   usage: graft.Verify [sfDir] [outDir]
  *     sfDir  default: $SPARK_GRAFT_SF_DIR, else /root/testdata/sf0.01
  *     outDir default: $SPARK_GRAFT_VERIFY_OUT, else ./verify_out
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_VERIFY_OUT"))
      .getOrElse("verify_out")
    System.err.println(s"[verify] sfDir=$sfDir outDir=$outDir")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    var ok = 0
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // The contract is a parquet at exactly outDir/<name>.parquet. Spark
      // writes a directory, so stage to a temp dir and move the single part
      // file to a plain file at the contract path.
      val tmp = s"$outDir/_tmp_$name"
      val dest = Paths.get(s"$outDir/$name.parquet")
      Files.deleteIfExists(dest) // never leave a stale result to compare
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file under $tmp"))
        Files.move(part.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ok += 1
        System.err.println(f"[verify] $name%-20s ok ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      } finally {
        new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      }
    }
    spark.stop()
    // bare last-line JSON summary on stdout (same q() escaping as above)
    println(s"""{"queries_ok":$ok,"queries_failed":[${failed.map(q).mkString(",")}],""" +
      s""""out_dir":${q(outDir)},"sf_dir":${q(sfDir)}}""")
    if (failed.nonEmpty) System.err.println(s"[verify] ${failed.size} queries failed")
  }
}
