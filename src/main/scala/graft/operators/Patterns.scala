package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gamma-pattern aggregation + pattern-stat attachment.
  *
  * The reference scans k dense DiBitMatrices in threaded 1024-cell chunks
  * with a lock-merged dedup (`/root/reference/src/patterns.jl:62-89`); the
  * Spark-native shape is a partial+final hash aggregate:
  * `pairs.groupBy(gammas).count()` — map-side combine collapses each
  * partition to <= 4^k rows before the (tiny) shuffle, so the aggregation
  * cost is one scan regardless of pair count. Pair membership is never
  * collect_list'ed (the reference's per-pattern index lists,
  * `matchPatterns.jl:23-31`, would be O(pairs) driver state); instead the
  * tiny EM-annotated pattern table is broadcast-joined back onto the pairs.
  */
object Patterns {

  def gammaCols(varnames: Seq[String]): Seq[String] = varnames.map(Gamma.gammaColName)

  /** Distinct gamma patterns + counts. Output columns: gamma_<var>..., counts. */
  def aggregate(pairs: DataFrame, varnames: Seq[String]): DataFrame = {
    val gcs = gammaCols(varnames)
    pairs.groupBy(gcs.map(col): _*).agg(count(lit(1)).as("counts"))
  }

  /** Collects the aggregated pattern table to the driver (<= 4^k rows) in a
    * deterministic order. gamma value 3 (missing) maps to -1 for the EM.
    */
  def collect(patternDf: DataFrame, varnames: Seq[String]): Seq[EmLink.Pattern] = {
    val gcs = gammaCols(varnames)
    patternDf
      .orderBy(gcs.map(col): _*)
      .collect()
      .map { row =>
        val gammas = gcs.indices.map { i =>
          val v = row.getByte(i).toInt
          if (v == Gamma.Missing.toInt) -1 else v
        }.toArray
        EmLink.Pattern(gammas, row.getLong(gcs.size))
      }
      .toSeq
  }

  /** The EM result as a small DataFrame keyed by the gamma columns:
    * gamma_<var>..., pattern_id, counts, weights, p_gamma_jm, p_gamma_ju,
    * zeta_j. (`-1` is mapped back to code 3 so it joins against pair rows.)
    */
  def statsDf(spark: SparkSession, em: EmLink.EmResult): DataFrame = {
    val schema = StructType(
      em.varnames.map(v => StructField(Gamma.gammaColName(v), ByteType, nullable = false)) ++
        Seq(
          StructField("pattern_id", IntegerType, nullable = false),
          StructField("counts", LongType, nullable = false),
          StructField("weights", DoubleType, nullable = false),
          StructField("p_gamma_jm", DoubleType, nullable = false),
          StructField("p_gamma_ju", DoubleType, nullable = false),
          StructField("zeta_j", DoubleType, nullable = false)))
    val rows = em.patterns.zipWithIndex.map { case (p, id) =>
      Row.fromSeq(
        p.gammas.toSeq.map(g => (if (g < 0) Gamma.Missing.toInt else g).toByte) ++
          Seq[Any](id, p.count, p.weight, p.pGammaJM, p.pGammaJU, p.zeta))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Broadcast-joins pattern stats back onto the pair DataFrame (the scale
    * path for `indices_to_uids`/`getMatches`: ids stay distributed).
    */
  def attach(pairs: DataFrame, stats: DataFrame, varnames: Seq[String]): DataFrame =
    pairs.join(broadcast(stats.drop("counts")), gammaCols(varnames), "left")
}
