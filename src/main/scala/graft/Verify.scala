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
  * It ALSO writes a machine-checkable correctness record — CORRECTNESS.json,
  * both in outDir and in the working directory — with one row per query:
  * {"rows": N, "schema": ["col:type", ...], "hash": "content-hash",
  *  "err": null|"...", "sec": t}. The hash: each row canonicalized as
  * columns-sorted-by-name values joined by \\u0001, md5'd, read as a 128-bit
  * unsigned int, summed mod 2^128 (computed distributively, see
  * [[fingerprint]]) — order-independent, so any two engines producing the
  * same multiset of rows agree.
  * `tools/check_oracles.py` then cross-writes per-query DuckDB oracle
  * verdicts ({"rows_match","schema_match","hash_match"}) into the same file.
  * Rationale: two driver rounds returned CORRECTNESS = {} while this exact
  * gate passed locally — the record must exist in-repo regardless of any
  * harness handshake.
  *
  *   usage: graft.Verify [sfDir] [outDir]
  *     sfDir  default: $SPARK_GRAFT_SF_DIR, else /root/testdata/sf0.01
  *     outDir default: $SPARK_GRAFT_VERIFY_OUT, else ./verify_out
  */
object Verify {

  /** Canonical string form of one value for the content hash: NULL marker,
    * 9-sig-digit scientific floats (stable across engines' default float
    * printing), epoch-millis timestamps, Base64 binary, toString otherwise.
    */
  def canonValue(v: Any): String = v match {
    case null => "NULL"
    case d: java.lang.Double =>
      if (d.isNaN) "NaN" else String.format(java.util.Locale.ROOT, "%.9e", d)
    case f: java.lang.Float =>
      if (f.isNaN) "NaN"
      else String.format(java.util.Locale.ROOT, "%.9e", Double.box(f.toDouble))
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case t: java.sql.Timestamp => t.getTime.toString
    case s: collection.Seq[_] => s.map(canonValue).mkString("[", ",", "]")
    case other => other.toString
  }

  /** (rows, schema, hash) of a written parquet result: columns sorted by
    * name; the content hash is the sum mod 2^128 of each canonical row
    * string's md5 read as a 128-bit unsigned int — order-independent
    * (addition commutes) and duplicate-sensitive (unlike xor), so any two
    * engines producing the same multiset of rows agree. Computed
    * DISTRIBUTIVELY: only per-partition (count, partial-sum) pairs reach the
    * driver — the old form collect()ed the entire result and sorted it,
    * which a pair-scale output at a larger sfDir would push past driver
    * memory.
    */
  def fingerprint(spark: SparkSession, path: String): (Long, Seq[String], String) = {
    val df = spark.read.parquet(path)
    val cols = df.columns.sorted.toSeq
    val schema = df.schema.fields.sortBy(_.name)
      .map(f => s"${f.name}:${f.dataType.simpleString}").toSeq
    val mod = BigInt(1) << 128
    val partials = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .rdd.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        var n = 0L
        var acc = BigInt(0)
        it.foreach { r =>
          val s = (0 until r.length).map(i => canonValue(r.get(i))).mkString("\u0001")
          acc = (acc + BigInt(1, md.digest(s.getBytes("UTF-8")))) % (BigInt(1) << 128)
          n += 1
        }
        Iterator((n, acc.toString(16)))
      }.collect()
    val rows = partials.map(_._1).sum
    val total = partials.foldLeft(BigInt(0))((a, p) => (a + BigInt(p._2, 16)) % mod)
    val hex = total.toString(16)
    (rows, schema, "0" * (32 - hex.length) + hex)
  }

  def main(args: Array[String]): Unit = {
    // Tolerant arg parsing (handshake insurance): positional [sfDir] [outDir],
    // or --sf-dir=/--sfdir=/--out-dir=/--outdir=/--out= flags in any order,
    // with env fallbacks and defaults. An unrecognized flag is ignored, not
    // fatal — a wrong invocation must still produce a correctness record.
    def flagVal(names: Seq[String]): Option[String] = args.collectFirst {
      case a if names.exists(n => a.toLowerCase.startsWith(n + "=")) =>
        a.substring(a.indexOf('=') + 1)
    }
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = flagVal(Seq("--sf-dir", "--sfdir", "--sf"))
      .orElse(positional.lift(0))
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val outDir = flagVal(Seq("--out-dir", "--outdir", "--out"))
      .orElse(positional.lift(1))
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
    // Self-referential oracles (the LSH queries re-verify VALUES on exactly
    // the emitted pair set) carry a __OUT_DIR__ placeholder — substitute the
    // run's resolved output dir (absolute, so the oracle runner's cwd is
    // irrelevant) at dump time.
    val outAbs = Paths.get(outDir).toAbsolutePath.toString
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__OUT_DIR__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    var ok = 0
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // per-query correctness record, written progressively (a crash mid-run
    // still leaves the completed queries' rows on disk)
    val record = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val hasOracle = SparkEntry.oracleSql.keySet
    def writeCorrectness(): Unit = {
      val body = record.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
      Seq(s"$outDir/CORRECTNESS.json", "CORRECTNESS.json").foreach { p =>
        try Files.writeString(Paths.get(p), body + "\n")
        catch { case e: Throwable => System.err.println(s"[verify] write $p: $e") }
      }
    }
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
        val sec = (System.nanoTime() - t0) / 1e9
        val (rows, schema, hash) = fingerprint(spark, dest.toString)
        record(name) =
          s"""{"rows":$rows,"schema":[${schema.map(q).mkString(",")}],""" +
            s""""hash":${q(hash)},"has_oracle":${hasOracle(name)},""" +
            s""""sec":${Fmt.num(sec, 2)},"err":null}"""
        ok += 1
        System.err.println(f"[verify] $name%-20s ok $sec%.1f s ($rows rows, $hash)")
      } catch { case e: Throwable =>
        failed += name
        record(name) = s"""{"rows":null,"schema":null,"hash":null,""" +
          s""""has_oracle":${hasOracle(name)},"err":${q(String.valueOf(e.getMessage))}}"""
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      } finally {
        new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
        writeCorrectness()
      }
    }
    spark.stop()
    // bare last-line JSON summary on stdout (same q() escaping as above),
    // carrying the full per-query correctness record so the harness can
    // recover it from stdout alone
    val corr = record.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    println(s"""{"queries_ok":$ok,"queries_failed":[${failed.map(q).mkString(",")}],""" +
      s""""out_dir":${q(outDir)},"sf_dir":${q(sfDir)},"correctness":$corr}""")
    if (failed.nonEmpty) System.err.println(s"[verify] ${failed.size} queries failed")
  }
}
