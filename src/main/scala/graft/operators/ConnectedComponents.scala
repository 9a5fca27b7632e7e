package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure of above-threshold pairs into entity clusters via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) as DataFrame
  * self-joins — the north-rule clustering stage.
  *
  * The reference has no clustering operator (its output is raw matched
  * pairs); this is the scale feature that turns pairs into entities.
  *
  * Scale properties: each round is two shuffles (groupBy min + re-emission);
  * converges in O(log^2 n) rounds on pathological graphs, 2-5 rounds on
  * dedup graphs (star-like clusters). Lineage is truncated every round with
  * localCheckpoint so the plan does not grow exponentially; at cluster scale
  * swap in reliable checkpointing (`spark.sparkContext.setCheckpointDir` +
  * `.checkpoint()`) for executor-loss resilience.
  *
  * Graphs at or under [[LocalMaxEdges]] deduplicated edges short-circuit to
  * a driver union-find (one bounded collect) — see the constant's doc for
  * the measured rationale; the iterative loop is the path above the cap,
  * with its shuffle partitioning sized to the edge count rather than the
  * session's pair-join setting.
  */
object ConnectedComponents {

  /** Below this many (deduplicated) edges the component assignment runs as a
    * driver-side union-find over ONE bounded collect (64 MB of long pairs at
    * the cap) instead of the iterative self-join loop. Rationale: each
    * large-star/small-star round is ~6 shuffle stages + a lineage-truncation
    * job, so on a tiny match graph the loop is pure scheduling latency
    * (measured: 28k edges → 22.8 s cold / 7.5 s warm at local[8], vs
    * milliseconds of actual union-find work). The match graph after
    * thresholding is routinely this small even when the scored pair space is
    * billions — and when it is NOT (web-scale dedupe with giant clusters),
    * the distributed loop below is the path taken. Same contract either way:
    * component = min reachable node id.
    */
  val LocalMaxEdges: Long = 4L << 20

  /** edges: two long columns (src, dst). Returns (node, component) where
    * component = min node id reachable.
    */
  def run(
      edges: DataFrame,
      maxIter: Int = 50,
      reliable: Boolean = false,
      localMaxEdges: Long = LocalMaxEdges): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // CC iterations are input-bytes-dominated (narrow long pairs), the
    // opposite of the pair-generation stages — AQE partition coalescing is
    // the right policy here even when the caller disabled it globally for
    // the output-dominated join stages. Scoped override, restored on exit.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "true")
    try runInternal(edges, maxIter, reliable, localMaxEdges)
    finally prevCoalesce match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None    => spark.conf.unset(coalesceKey)
    }
  }

  /** Driver union-find over a bounded edge list: roots are always the
    * minimum id of their set, so find(x) IS the component label. Attaching
    * the larger root under the smaller (union-by-min) plus full path
    * compression keeps this effectively linear at the ≤[[LocalMaxEdges]]
    * sizes that reach it.
    */
  private[operators] def unionFindLocal(pairs: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      var y = x0 // path compression
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    pairs.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru < rv) parent(rv) = ru
      else if (rv < ru) parent(ru) = rv
    }
    pairs.iterator.flatMap { case (u, v) => Iterator(u, v) }.toSet.toSeq
      .map((n: Long) => (n, find(n)))
  }

  private def runInternal(
      edges: DataFrame, maxIter: Int, reliable: Boolean,
      localMaxEdges: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    def checkpoint(df: DataFrame): DataFrame = {
      val out = if (reliable) df.checkpoint() else df.localCheckpoint()
      out
    }

    // normalize: undirected, no self-loops, as (u, v)
    var e = checkpoint(
      edges.toDF("u", "v")
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
        .distinct())

    val nEdges = e.count()
    if (nEdges <= localMaxEdges) {
      val local = unionFindLocal(e.as[(Long, Long)].collect())
      return spark.createDataset(local).toDF("node", "component")
    }
    // large graph: size the loop's shuffles to the data (the session's
    // pair-join partitioning is far too fine for long-pair iterations; fewer
    // tasks = less per-round scheduling latency, AQE still coalesces below)
    val partKey = "spark.sql.shuffle.partitions"
    val prevPart = spark.conf.getOption(partKey)
    spark.conf.set(partKey,
      math.max(16L, math.min(spark.conf.get(partKey).toLong, nEdges / 2000000L)).toString)
    try runLoop(e, maxIter, checkpoint)
    finally prevPart match {
      case Some(v) => spark.conf.set(partKey, v)
      case None    => spark.conf.unset(partKey)
    }
  }

  private def runLoop(
      e0: DataFrame, maxIter: Int,
      checkpoint: DataFrame => DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    var e = e0

    var iter = 0
    var converged = false
    // order-free checksum of the current edge multiset; recomputed once per
    // iteration (the previous iteration's value is reused, not re-queried)
    def checksumOf(df: DataFrame) =
      df.agg(sum(xxhash64($"u", $"v").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("c")).head()
    var prevSum = checksumOf(e)
    while (!converged && iter < maxIter) {
      // --- large-star: connect every neighbor larger than u to the min of
      // N(u) u {u} ---
      val nbrs = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
      val mins = nbrs.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val large = nbrs
        .join(mins, "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
        .distinct()
      // --- small-star: connect every neighbor <= u to the min ---
      val nbrs2 = large.select($"u", $"v").union(large.select($"v".as("u"), $"u".as("v")))
      val smallNbrs = nbrs2.filter($"v" <= $"u")
      val mins2 = smallNbrs.groupBy($"u").agg(least(min($"v"), first($"u")).as("m"))
      val small = smallNbrs
        .join(mins2, "u")
        .select($"v".as("u"), $"m".as("v"))
        .union(mins2.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
        .distinct()

      val next = checkpoint(small)
      val newSum = checksumOf(next)
      converged = prevSum == newSum
      prevSum = newSum
      e.unpersist()
      e = next
      iter += 1
    }

    // components: every edge now points at its root (star graph)
    val assign = e.select($"v".as("node"), $"u".as("component"))
      .union(e.select($"u".as("node"), $"u".as("component")))
      .groupBy($"node").agg(min($"component").as("component"))
    assign
  }

  /** Convenience: cluster matched pairs (id_a, id_b) and return
    * (node, component) covering every node that appears in a pair.
    */
  def clusterPairs(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame =
    run(pairs.select(col(idA).cast("long"), col(idB).cast("long")))
}
