package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise link-quality evaluation: precision / recall / F1 of a scored
  * pair table against a labeled truth pair table, swept over a threshold
  * grid in ONE pass. This is the north rule's acceptance metric (pairwise
  * F1 ≥ 0.99 on labeled pairs at a fixed blocking key) as a reusable
  * operator — picking the production threshold IS this sweep.
  *
  * Shape at scale: both inputs are pair-scale; the pair keys are normalized
  * to unordered `(least, greatest)` form, scored full-outer-joins truth
  * ONCE on the pair key (an equi-join — the same shuffle class as the
  * blocking join that produced the scores), then one
  * `explode(thresholds)` + partial+final hash aggregate. The threshold grid
  * multiplies only the aggregate input (|thresholds| rows per joined pair,
  * combined map-side down to |thresholds| rows total) — it never rescans
  * or re-joins the pair tables.
  *
  * Contract: one row per unordered pair on each side (the shape
  * `LinkResult.matches()` / any `id_a < id_b` pair table already has) —
  * duplicates would double-count. Truth pairs the scorer never saw (e.g.
  * cross-block pairs unreachable at the blocking key) count as false
  * negatives at every threshold, which is exactly the blocking-recall
  * penalty the metric must expose.
  */
object Evaluation {

  /** @param scored pair table with `id_a`, `id_b` and `scoreCol`
    * @param truth  labeled-match pair table with `id_a`, `id_b`
    * @return one row per threshold: `threshold, tp, fp, fn, precision,
    *         recall, f1` (metrics 0.0 when their denominator is 0)
    */
  def thresholdSweep(
      scored: DataFrame,
      truth: DataFrame,
      thresholds: Seq[Double],
      scoreCol: String = "score"): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep needs at least one threshold")
    val s = scored.select(
      least(col("id_a"), col("id_b")).as("__pa"),
      greatest(col("id_a"), col("id_b")).as("__pb"),
      col(scoreCol).cast("double").as("__score"))
    val t = truth.select(
      least(col("id_a"), col("id_b")).as("__pa"),
      greatest(col("id_a"), col("id_b")).as("__pb"),
      lit(true).as("__truth"))
    val joined = s.join(t, Seq("__pa", "__pb"), "full_outer")
      .select(col("__score"), coalesce(col("__truth"), lit(false)).as("__truth"))
    sweepOver(joined, thresholds)
  }

  /** Single-table variant for when the labels already ride the scored pair
    * table as a boolean column: no join at all — the sweep is ONE
    * explode(grid) + hash aggregate over the input. Use this whenever the
    * scorer and the labeler saw the same pair space (the common case: truth
    * is a predicate over pair attributes); the two-table form exists for
    * truth sets with pairs the scorer never produced. A truth pair absent
    * from `pairs` cannot be represented here — it would silently not count
    * as a false negative.
    */
  def thresholdSweepLabeled(
      pairs: DataFrame,
      truthCol: String,
      thresholds: Seq[Double],
      scoreCol: String = "score"): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep needs at least one threshold")
    sweepOver(pairs.select(col(scoreCol).cast("double").as("__score"),
      col(truthCol).cast("boolean").as("__truth")), thresholds)
  }

  /** Shared sweep core over a `(__score, __truth)` table. A null `__score`
    * (truth pair the scorer never produced) fails every `>= threshold`
    * test → false negative at every threshold, by design:
    * fn = (total truth pairs) - tp.
    */
  private def sweepOver(scored: DataFrame, thresholds: Seq[Double]): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // distinct: a duplicated grid value would explode each pair twice into
    // the same group and double that threshold's counts
    val grid = thresholds.distinct
    // NaN guard: Spark orders NaN ABOVE every double, so a NaN score would
    // count as a positive prediction at every threshold; treat it like a
    // null score instead (unscored → false negative if truth)
    val scoreOk = !isnan(col("__score")) && col("__score") >= col("threshold")
    val tp = sum(when(col("__truth") && scoreOk, 1L).otherwise(0L)).as("tp")
    val fp = sum(when(!col("__truth") && scoreOk, 1L).otherwise(0L)).as("fp")
    val truthN = sum(when(col("__truth"), 1L).otherwise(0L)).as("__truth_n")
    val counted = scored
      .select(col("__score"), col("__truth"),
        explode(array(grid.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(tp, fp, truthN)
    // left join FROM the grid: an empty pair table must still yield the
    // documented one row per threshold (all-zero counts), not zero rows
    grid.toDF("threshold")
      .join(counted, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("__truth_n"), lit(0L)).as("__truth_n"))
      .withColumn("fn", col("__truth_n") - col("tp"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")))
          .as("precision"),
        when(col("tp") + col("fn") === 0, 0.0)
          .otherwise(col("tp").cast("double") / (col("tp") + col("fn")))
          .as("recall"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, 0.0)
          .otherwise((col("tp") * 2).cast("double") /
            (col("tp") * 2 + col("fp") + col("fn")))
          .as("f1"))
      .orderBy("threshold")
  }

  /** B-cubed precision/recall/F1 of a predicted clustering against a truth
    * clustering — the standard CLUSTER-level ER quality metric (pairwise F1
    * over-weights large clusters; B-cubed averages per NODE: for node i
    * with predicted cluster C(i) and truth cluster T(i),
    * P(i) = |C(i)∩T(i)|/|C(i)|, R(i) = |C(i)∩T(i)|/|T(i)|; B³P/B³R are the
    * node averages and F1 their harmonic mean).
    *
    * Shape at scale: one node-keyed equi-join pred×truth (node-scale, the
    * same class as the clustering's own output), one (pred, truth)-cell
    * hash aggregate, and two cell-scale aggregates that derive the cluster
    * sizes FROM the cells (never rescanning the inputs) — per-node sums
    * collapse algebraically to Σ n_ct²/n_c and Σ n_ct²/n_t over cells.
    * Nodes present in only one clustering are ignored (inner join):
    * evaluate over the labeled subset.
    *
    * Inputs: `(node, cluster)` assignments, one row per node.
    */
  def bcubed(pred: DataFrame, truth: DataFrame): DataFrame = {
    val j = pred.select(col("node"), col("cluster").as("__c"))
      .join(truth.select(col("node"), col("cluster").as("__t")), "node")
    val cells = j.groupBy("__c", "__t").agg(count(lit(1)).as("n_ct"))
    val nc = cells.groupBy("__c").agg(sum("n_ct").as("n_c"))
    val nt = cells.groupBy("__t").agg(sum("n_ct").as("n_t"))
    // n_ct² as double: a Long product would overflow for clusters past ~3e9
    // nodes, and the result only feeds a floating-point average anyway
    val sq = col("n_ct").cast("double") * col("n_ct")
    cells.join(nc, "__c").join(nt, "__t")
      .agg(sum(sq / col("n_c")).as("__sum_p"),
        sum(sq / col("n_t")).as("__sum_r"),
        sum("n_ct").as("n_nodes"))
      .select(coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        // empty labeled intersection → 0.0 metrics, not null/NaN
        coalesce(col("__sum_p") / col("n_nodes"), lit(0.0)).as("bcubed_precision"),
        coalesce(col("__sum_r") / col("n_nodes"), lit(0.0)).as("bcubed_recall"),
        coalesce(lit(2.0) * (col("__sum_p") / col("n_nodes")) *
          (col("__sum_r") / col("n_nodes")) /
          ((col("__sum_p") / col("n_nodes")) +
            (col("__sum_r") / col("n_nodes"))), lit(0.0)).as("bcubed_f1"))
  }
}
