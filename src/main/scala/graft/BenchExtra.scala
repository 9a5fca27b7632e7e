package graft

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for the optimization rounds (guide §1).
  *
  * NOT part of the frozen driver contract (Bench.scala is the graded bench);
  * this main exists so per-query iteration doesn't pay the full Bench's
  * scaling phases, and so `.explain("formatted")` plans can be captured to
  * files for the plan-audit artifacts (plans/r06/).
  *
  * Usage (same env contract as Bench — SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS):
  *   runMain graft.BenchExtra time q_cosine_join,q_cosine_index   # 2 reps each
  *   runMain graft.BenchExtra time all
  *   runMain graft.BenchExtra noop q_cosine_join                  # noop-sink timing
  *   runMain graft.BenchExtra explain plans/r06 _before q_cosine_join,...
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mode = args.headOption.getOrElse("time")
    val spark = session(cpus)

    def queryNames(spec: String): Seq[String] =
      if (spec == "all") SparkEntry.queries.keys.toSeq.sorted
      else spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    // same warmup shape as Bench phase 1 (reader + codegen + page cache)
    def warmup(): Unit = {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case e: Throwable => System.err.println(s"[extra] warmup $t: $e") }
      }
      try spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("sum(length(text))").collect()
      catch { case e: Throwable => () }
      try spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("sum(size(embedding))").collect()
      catch { case e: Throwable => () }
      Seq("q3_topk_per_lang", "q_gamma_jw").foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[extra] warmup $q: $e") }
      }
      spark.catalog.clearCache()
      System.err.println("[extra] warmup done")
    }

    mode match {
      case "time" | "noop" =>
        val names = queryNames(args.lift(1).getOrElse("all"))
        val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
        warmup()
        val results = names.map { name =>
          val fn = SparkEntry.queries(name)
          def once(): Double = timed {
            try {
              spark.sparkContext.setJobDescription(name)
              val df = fn(spark, sfDir)
              if (mode == "noop")
                df.write.format("noop").mode("overwrite").save()
              else df.count()
            } catch { case e: Throwable => System.err.println(s"[extra] $name: $e") }
          }._2
          val sec = (1 to reps).map { i =>
            if (i > 1) { spark.catalog.clearCache(); SparkEntry.clearEmMemo() }
            once()
          }.min
          System.err.println(f"[extra] $name%-26s $sec%8.2f s")
          name -> sec
        }
        println(results.map { case (k, v) => "\"" + k + "\":" + Fmt.num(v, 3) }
          .mkString("{", ",", "}"))

      case "explain" =>
        val outDir = args(1)
        val suffix = args(2)
        val names = queryNames(args.lift(3).getOrElse("all"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { name =>
          try {
            val df = SparkEntry.queries(name)(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
            System.err.println(s"[extra] wrote $outDir/$name$suffix.txt")
          } catch {
            case e: Throwable => System.err.println(s"[extra] explain $name: $e")
          }
        }

      case other =>
        System.err.println(s"unknown mode: $other (time|noop|explain)")
    }
    spark.stop()
  }
}
