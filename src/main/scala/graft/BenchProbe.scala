package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config._
import graft.operators._
import graft.sources.WebCorpus

/** Phase-level profiling of the link-and-cluster job (dev tool). */
object BenchProbe {
  import org.apache.spark.scheduler._
  import scala.collection.mutable

  final class StageStats extends SparkListener {
    case class S(name: String, var tasks: Int = 0, var sumMs: Long = 0, var maxMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, S]()
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      stages(e.stageInfo.stageId) = S(e.stageInfo.name.take(60))
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      stages.get(e.stageId).foreach { s =>
        s.tasks += 1
        val ms = e.taskInfo.duration
        s.sumMs += ms
        s.maxMs = math.max(s.maxMs, ms)
      }
    }
    def dumpAndReset(): Unit = {
      stages.values.filter(_.sumMs > 500).foreach { s =>
        System.err.println(f"[stage] tasks=${s.tasks}%4d sum=${s.sumMs / 1000.0}%8.1fs " +
          f"max=${s.maxMs / 1000.0}%7.2fs  ${s.name}")
      }
      stages.clear()
    }
  }
  var listener: StageStats = _

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def timed(label: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    val g0 = gcMillis
    val r = f
    System.err.println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
      f"gc=${(gcMillis - g0) / 1000.0}%6.2f s  ($r)")
    if (listener != null) listener.dumpAndReset()
  }

  def run(spark: SparkSession, nBase: Long, nHosts: Int): Unit = {
    val pages = WebCorpus.linkInput(spark, WebCorpus.Params(nBase = nBase,
      dupFraction = 0.25, nHosts = nHosts))
    timed("corpus count")(pages.count())
    timed("corpus count again")(pages.count())
    val specs = Seq(
      VariableSpec("title", "jarowinkler", cutA = 0.92, cutB = 0.88),
      VariableSpec("mid3", "jarowinkler", cutA = 0.92, cutB = 0.88),
      VariableSpec("tail3", "jarowinkler", cutA = 0.92, cutB = 0.88),
      VariableSpec("tok1", "exact"),
      VariableSpec("lang", "exact"),
      VariableSpec("n_tokens", "numeric", cutA = 1, cutB = 3))
    val cfg = MatchConfig(idA = "ida", idB = "idb",
      comparisons = ComparisonGroup(name = "bench", variables = specs))
    def side(id: String) = pages.select(col("page_id").as(id), col("title"), col("mid3"),
      col("tail3"), col("tok1"), col("lang"), col("n_tokens"), col("block"))
    val pairs = Linker.buildPairs(side("ida"), side("idb"), cfg.copy(idA = "ida", idB = "idb"),
      specs, Seq("block"), maxBlockRows = Some(1000L),
      fanoutPartitions =
        Some(math.max(64, spark.sparkContext.defaultParallelism * 2)))
    timed("pair count (join only)")(pairs.count())
    val withG = Gamma.addGammaColumns(pairs, specs)
    val narrowCols = (Seq("id_a", "id_b") ++ specs.map(s => "gamma_" + s.varname)).map(col)
    val narrow = withG.select(narrowCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("gamma+persist pass (count)")(narrow.count())
    val agg = Patterns.aggregate(narrow, specs.map(_.varname))
    var collected: Seq[EmLink.Pattern] = null
    timed("pattern agg (cached)")({ collected = Patterns.collect(agg, specs.map(_.varname)); collected.size })
    var em: EmLink.EmResult = null
    timed("EM (driver)")({ em = EmLink.run(collected, (1L, 1L), specs.map(_.varname)); em.iterConverge })
    val stats = Patterns.statsDf(spark, em)
    val annotated = Patterns.attach(narrow, stats, specs.map(_.varname))
    val matched = annotated.filter(col("zeta_j") >= 0.85 && col("id_a") < col("id_b"))
    timed("matches pass (cached)")(matched.count())
    var comps: DataFrame = null
    timed("CC")({ comps = ConnectedComponents.clusterPairs(matched); comps.count() })
    timed("cluster count")(comps.select(countDistinct("component")).head().getLong(0))
  }

  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(30000L)
    val cpuList = args.drop(1).headOption.getOrElse("32,8,32").split(",").map(_.toInt).toSeq
    cpuList.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"probe-$cpus")
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.sql.adaptive.enabled", "true")
        // AQE defaults (coalescing ON) — the pair join's fan-out is
        // protected structurally via fanoutPartitions, mirroring Bench
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      listener = new StageStats
      spark.sparkContext.addSparkListener(listener)
      System.err.println(s"=== cpus=$cpus nBase=$nBase ===")
      run(spark, nBase, 60)
      spark.stop()
    }
  }
}
