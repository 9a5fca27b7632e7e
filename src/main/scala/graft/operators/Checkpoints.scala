package graft.operators

import java.nio.file.{Files, Paths}
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
  private def metaPath(root: String, stage: String) = s"$root/$stage/_graft_meta.json"

  def isComplete(root: String, stage: String): Boolean =
    Files.exists(Paths.get(metaPath(root, stage)))

  /** Returns the checkpointed stage if complete, else computes `df`, writes
    * it + metadata, and returns the re-read (lineage-truncated) DataFrame.
    */
  def materialize(spark: SparkSession, root: String, stage: String)(df: => DataFrame): DataFrame = {
    if (!isComplete(root, stage)) {
      val d = df
      d.write.mode("overwrite").parquet(dir(root, stage))
      // per-partition lineage counters from the files just written
      val written = spark.read.parquet(dir(root, stage))
      val perPart = written
        .groupBy(spark_partition_id().as("pid"))
        .count()
        .orderBy("pid")
        .collect()
        .map(_.getLong(1))
        .toSeq
      val info = StageInfo(stage, perPart.sum, perPart.size, perPart,
        System.currentTimeMillis())
      val json =
        s"""{"stage":"${info.stage}","rows":${info.rows},""" +
          s""""partitions":${info.partitions},""" +
          s""""per_partition_rows":[${info.perPartitionRows.mkString(",")}],""" +
          s""""written_at_ms":${info.writtenAtMs}}"""
      Files.writeString(Paths.get(metaPath(root, stage)), json)
    }
    spark.read.parquet(dir(root, stage))
  }

  def readInfo(root: String, stage: String): Option[StageInfo] =
    if (!isComplete(root, stage)) None
    else {
      val json = Files.readString(Paths.get(metaPath(root, stage)))
      def grab(k: String) = s""""$k":([0-9]+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
      val parts = s""""per_partition_rows":\\[([0-9,]*)\\]""".r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
      Some(StageInfo(stage,
        grab("rows").getOrElse(0L),
        grab("partitions").getOrElse(0L).toInt,
        if (parts.isEmpty) Nil else parts.split(",").map(_.toLong).toSeq,
        grab("written_at_ms").getOrElse(0L)))
    }

  /** Resumable end-to-end link-and-cluster: each stage lands in
    * `root/<stage>` and is skipped on re-run. Stages: `gammas` (narrow pair
    * table), `patterns` (aggregated pattern counts), `matches`
    * (above-threshold pairs), `clusters` (connected components).
    *
    * Flat single-EM configs only: hierarchical comparison groups (staged
    * child EMs binarized into parent gammas) and TF adjustment run through
    * [[Linker.link]]'s full path, which this checkpointed flow does not
    * reproduce — fail fast rather than silently flatten the config (wrong
    * zetas with no error is the worst linkage failure mode).
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
    require(cfg.comparisons.children.isEmpty,
      "linkAndClusterResumable runs flat configs; hierarchical comparison " +
        "groups need the staged child EMs of Linker.link — running them " +
        "flattened would silently change every zeta")
    require(!cfg.comparisons.variables.exists(_.tfAdjust),
      "linkAndClusterResumable does not apply term-frequency adjustment; " +
        "use Linker.link for tf_adjust variables")
    val specs = cfg.comparisons.allVariables
    val varnames = specs.map(_.varname)

    val gammas = materialize(spark, root, "gammas") {
      val pairs0 = Linker.buildPairs(dfA, dfB, cfg, specs, blockCols,
        maxBlockRows, fanoutPartitions)
      val pairs = pairFilter.fold(pairs0)(pairs0.filter)
      Gamma.addGammaColumns(pairs, specs)
        .select((Seq("id_a", "id_b") ++ varnames.map(Gamma.gammaColName)).map(col): _*)
    }
    val patternDf = materialize(spark, root, "patterns") {
      Patterns.aggregate(gammas, varnames)
    }
    // comparisonSpace overrides nA*nB when a pairFilter shrank the space EM
    // sees (dedupe's id_a < id_b cut => N(N-1)/2); EmLink uses only the
    // product of dims, so the override rides in the first slot.
    val rawDims = (dfA.count(), dfB.count())
    val dims = comparisonSpace.fold(rawDims)(f => (f(rawDims._1, rawDims._2), 1L))
    val em = EmLink.run(Patterns.collect(patternDf, varnames),
      dims, varnames, cfg.comparisons.em)
    val matches = materialize(spark, root, "matches") {
      Patterns.attach(gammas, Patterns.statsDf(spark, em), varnames)
        .filter(col("zeta_j") >= cfg.comparisons.em.thresholdMatch)
        .select("id_a", "id_b", "zeta_j")
    }
    materialize(spark, root, "clusters") {
      ConnectedComponents.clusterPairs(matches.filter(col("id_a") < col("id_b")))
    }
  }
}
