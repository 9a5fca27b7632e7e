package graft.operators

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable per-stage checkpointing (north rule): every pipeline stage can
  * be materialized to Parquet with a sidecar metadata file carrying row
  * counts, per-partition lineage counters, and the wall-clock of the write.
  * A re-run skips any stage whose checkpoint is complete — a crashed
  * link-and-cluster job resumes mid-pipeline instead of recomputing the pair
  * space.
  *
  * Parquet (not `df.checkpoint()`) because it is engine-readable, survives
  * the Spark application, and doubles as the stage's output contract. On a
  * cluster, point `root` at an object-store path (the Iceberg-table variant
  * is a `writeTo(...).createOrReplace()` away — same shape).
  */
object Checkpoints {

  final case class StageInfo(
      stage: String,
      rows: Long,
      partitions: Int,
      perPartitionRows: Seq[Long],
      writtenAtMs: Long)

  private def dir(root: String, stage: String) = s"$root/$stage"
  private def metaAt(path: String) = s"$path/_graft_meta.json"
  private def metaPath(root: String, stage: String) = metaAt(dir(root, stage))

  // Sidecar I/O goes through the Hadoop FileSystem of the checkpoint path —
  // the root can be HDFS/object-store (the cluster deployment the Pipeline
  // CLI advertises), where java.nio would silently resolve to a bogus
  // driver-local path.
  private def hconf() =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private[operators] def fileExists(path: String): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(hconf()).exists(p)
  }

  private[operators] def readFile(path: String): String = {
    val p = new HPath(path)
    val in = p.getFileSystem(hconf()).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private[operators] def writeFile(path: String, content: String): Unit = {
    val p = new HPath(path)
    val out = p.getFileSystem(hconf()).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** A checkpoint directory is complete iff its sidecar exists — the sidecar
    * is written strictly after the parquet commit, so a crash mid-write
    * leaves the stage incomplete and it recomputes (mode=overwrite clears
    * the partial output).
    */
  def isCompleteAt(path: String): Boolean = fileExists(metaAt(path))

  def isComplete(root: String, stage: String): Boolean =
    isCompleteAt(dir(root, stage))

  /** Returns the checkpointed DataFrame at `path` if complete, else computes
    * `df`, writes it + metadata, and returns the re-read (lineage-truncated)
    * DataFrame. The stage name recorded in the sidecar is the last path
    * segment.
    */
  def materializeAt(spark: SparkSession, path: String)(df: => DataFrame): DataFrame = {
    if (!isCompleteAt(path)) {
      val d = df
      d.write.mode("overwrite").parquet(path)
      // per-partition lineage counters from the files just written
      val written = spark.read.parquet(path)
      val perPart = written
        .groupBy(spark_partition_id().as("pid"))
        .count()
        .orderBy("pid")
        .collect()
        .map(_.getLong(1))
        .toSeq
      val stage = path.reverse.dropWhile(_ == '/').takeWhile(_ != '/').reverse
      val info = StageInfo(stage, perPart.sum, perPart.size, perPart,
        System.currentTimeMillis())
      val json =
        s"""{"stage":"${info.stage}","rows":${info.rows},""" +
          s""""partitions":${info.partitions},""" +
          s""""per_partition_rows":[${info.perPartitionRows.mkString(",")}],""" +
          s""""written_at_ms":${info.writtenAtMs}}"""
      writeFile(metaAt(path), json)
    }
    spark.read.parquet(path)
  }

  def materialize(spark: SparkSession, root: String, stage: String)(df: => DataFrame): DataFrame =
    materializeAt(spark, dir(root, stage))(df)

  def readInfo(root: String, stage: String): Option[StageInfo] =
    if (!isComplete(root, stage)) None
    else {
      val json = readFile(metaPath(root, stage))
      def grab(k: String) = s""""$k":([0-9]+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
      val parts = s""""per_partition_rows":\\[([0-9,]*)\\]""".r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
      Some(StageInfo(stage,
        grab("rows").getOrElse(0L),
        grab("partitions").getOrElse(0L).toInt,
        if (parts.isEmpty) Nil else parts.split(",").map(_.toLong).toSeq,
        grab("written_at_ms").getOrElse(0L)))
    }

  /** Stage names a given config produces under the checkpoint root, in
    * pipeline order: the narrow gamma table, one pattern table per EM stage
    * (children leaf-first, root last — [[Linker.link]]'s order), the
    * above-threshold matches, and the clusters.
    */
  def stageNames(cfg: graft.config.MatchConfig): Seq[String] =
    "gammas" +: cfg.stages.map(g => s"patterns_${g.name}") :+ "matches" :+ "clusters"

  /** Resumable end-to-end link-and-cluster over [[Linker.link]]'s FULL path
    * — hierarchical comparison groups (staged child EMs binarized into
    * parent gammas) and term-frequency adjustment included. Each stage lands
    * in `root/<stage>` with a lineage sidecar and is skipped on re-run:
    *
    *  - `gammas`: the narrow (ids + gammas [+ tf]) pair table — the pair
    *    join and every comparator kernel run at most once per root.
    *  - `patterns_<stage>`: each EM stage's aggregated pattern counts
    *    (<= 4^k rows) — a resume re-runs the driver-side EM from these
    *    without rescanning the pair table.
    *  - `matches`: above-threshold pairs, scored by `final_zeta` when TF
    *    adjustment ran (aliased to `zeta_j` for a stable output schema).
    *  - `clusters`: connected components of the match graph.
    *
    * The EMs themselves recompute on every run — deterministic driver-side
    * math over the checkpointed pattern counts, so a fully-checkpointed
    * resume touches only tiny parquet + the row-scale input counts.
    */
  def linkAndClusterResumable(
      dfA: DataFrame,
      dfB: DataFrame,
      cfg: graft.config.MatchConfig,
      blockCols: Seq[String],
      root: String,
      maxBlockRows: Option[Long] = None,
      fanoutPartitions: Option[Int] = None,
      pairFilter: Option[org.apache.spark.sql.Column] = None,
      comparisonSpace: Option[(Long, Long) => Long] = None): DataFrame = {
    val spark = dfA.sparkSession
    // stage names double as checkpoint directory names — a config with two
    // comparison groups sharing a name would resume one stage's EM from the
    // other's pattern table with no error
    val names = stageNames(cfg)
    require(names.distinct == names,
      s"comparison group names must be unique (checkpoint stages collide): " +
        names.diff(names.distinct).distinct.mkString(", "))
    val result = Linker.link(dfA, dfB, cfg, blockCols,
      maxBlockRows = maxBlockRows,
      persistPath = Some(dir(root, "gammas")),
      fanoutPartitions = fanoutPartitions,
      pairFilter = pairFilter,
      comparisonSpace = comparisonSpace,
      patternStage = (name, agg) => materialize(spark, root, s"patterns_$name")(agg()))
    val matches = materialize(spark, root, "matches") {
      result.matches().select(col("id_a"), col("id_b"),
        col(result.scoreColName).as("zeta_j"))
    }
    materialize(spark, root, "clusters") {
      // every matched pair is an edge — clusterPairs normalizes direction,
      // self-loops, and duplicates itself; filtering id_a < id_b here would
      // silently drop link-mode edges whose A-id happens to exceed its B-id
      ConnectedComponents.clusterPairs(matches)
    }
  }
}
