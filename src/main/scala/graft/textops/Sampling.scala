package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here is hash-of-id based: the assignment of a row is a pure
  * function of (id, salt) — stable across runs, cluster sizes, partition
  * layouts, and engines (md5 is engine-portable, unlike xxhash64 whose
  * seeds differ between Spark and DuckDB). No RNG, no sample() (Spark's
  * sample is partition-layout-dependent).
  */
object Sampling {

  /** Hex-threshold bucket in [0, 256): the first two hex chars of
    * md5(id || salt), compared lexicographically. fraction f maps to the
    * threshold floor(256 * f) rendered as two hex digits.
    */
  private def hexThreshold(fraction: Double): String = {
    require(fraction > 0 && fraction < 1, "fraction must be in (0,1)")
    f"${math.floor(256 * fraction).toInt}%02x"
  }

  /** Deterministic train/val split: adds a `split` column
    * ("train" | "val"). A row is train iff the first byte of
    * md5(cast(id as string) || salt) < floor(256 * trainFraction) —
    * ~trainFraction of rows, exactly reproducible anywhere md5 exists.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainFraction: Double = 0.8,
      salt: String = ""): DataFrame =
    df.withColumn("split",
      when(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 2)
        < hexThreshold(trainFraction), "train").otherwise("val"))

  /** Deterministic subsample: keep ~fraction of rows by the same hash rule.
    * Complementary fractions partition the data (keep(f) ∪ drop(f) = all).
    */
  def hashSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      salt: String = ""): DataFrame =
    df.filter(
      substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 2)
        < hexThreshold(fraction))

  /** The split predicate as a reusable Column (for SQL twins / pushdown). */
  def splitCol(idCol: Column, trainFraction: Double, salt: String = ""): Column =
    when(substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 2)
      < hexThreshold(trainFraction), "train").otherwise("val")

  /** Per-stratum keep predicate at 32-bit granularity: the first 8 hex chars
    * of md5(id || salt) compared lexicographically against
    * floor(2^32 * rate) as 8 lowercase hex digits (hex-string order == the
    * numeric order, and the comparison is engine-portable). rate >= 1 keeps
    * everything, rate <= 0 drops everything (no 9-digit threshold string
    * whose length would break lexicographic comparison).
    */
  def rateKeep(idCol: Column, rate: Double, salt: String = ""): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(concat(idCol.cast("string"), lit(salt))), 1, 8) <
      f"${math.floor(4294967296.0 * rate).toLong}%08x"

  /** Deterministic data-mixture sampling: keep each row with its stratum's
    * rate (e.g. up-weight curated sources, down-weight raw crawl — the
    * training-data "mixing" step). Rows whose stratum value has no entry in
    * `rates` are DROPPED — a mixture definition is exhaustive by contract,
    * and silently keeping unlisted strata would leak unvetted sources into
    * a training set.
    *
    * Scale shape: a pure codegen filter projection (when-chain over the
    * handful of strata) — no shuffle, no join, fully pushdown-friendly;
    * assignment is a pure function of (id, salt), so re-runs, retries, and
    * engine ports agree row-for-row.
    */
  def weightedMix(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      rates: Map[String, Double],
      salt: String = ""): DataFrame = {
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, rateKeep(col(idCol), rate, salt))
          .otherwise(acc)
    }
    df.filter(keep)
  }
}
