package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter

/** Driver-built, broadcast Bloom filters over one DataFrame column — the
  * shuffle-reducing pre-filter for joins whose probe side is huge and whose
  * build side is too big to broadcast EXACTLY but fits as a Bloom (~1.2
  * bytes per element at 1% fpp vs the raw values plus hash-map overhead —
  * roughly an order of magnitude smaller for shingle strings). Bloom filters
  * have NO false negatives, so a caller that keeps the exact equi/semi-join
  * AFTER the filter gets bit-identical results; false positives only cost
  * wasted join input (~fpp of the probe side).
  *
  * Built with ONE `treeAggregate` pass (2-level partial combine — the
  * 1000-executor shape: per-partition blooms merge pairwise on executors
  * before the final driver merge, instead of every partition's multi-MB
  * bloom landing on the driver at once as a flat `aggregate` would).
  *
  * Put/probe symmetry is pinned by construction: strings are inserted AND
  * probed as their UTF-8 bytes ([[BloomMightContain]] probes
  * `mightContainBinary(utf8.getBytes)`), longs via `putLong`/
  * `mightContainLong` — no reliance on the sketch library's `putString`
  * internals.
  */
object BloomFilters {

  private def build(
      df: DataFrame,
      expectedItems: Long,
      fpp: Double,
      put: (BloomFilter, org.apache.spark.sql.Row) => Unit): Broadcast[BloomFilter] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    val bloom = df.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      (bf, r) => { put(bf, r); bf },
      (a, b) => { a.mergeInPlace(b); a })
    df.sparkSession.sparkContext.broadcast(bloom)
  }

  /** Bloom over a string column (null rows skipped). Size with the DISTINCT
    * cardinality — duplicates re-put the same bits.
    */
  def stringBloom(
      df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double = 0.01): Broadcast[BloomFilter] =
    build(
      df.filter(col(colName).isNotNull).select(col(colName).cast("string")),
      expectedItems, fpp,
      (bf, r) => bf.putBinary(r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Bloom over a long column (null rows skipped). */
  def longBloom(
      df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double = 0.01): Broadcast[BloomFilter] =
    build(
      df.filter(col(colName).isNotNull).select(col(colName).cast("long")),
      expectedItems, fpp,
      (bf, r) => bf.putLong(r.getLong(0)))
}
