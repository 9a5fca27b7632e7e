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
    val grid = explode(array(thresholds.map(lit): _*)).as("threshold")
    // null __score (truth pair the scorer never produced) fails every
    // `>= threshold` test → false negative at every threshold, by design:
    // fn = (total truth pairs) - tp
    val tp = sum(when(col("__truth") && col("__score") >= col("threshold"), 1L)
      .otherwise(0L)).as("tp")
    val fp = sum(when(!col("__truth") && col("__score") >= col("threshold"), 1L)
      .otherwise(0L)).as("fp")
    val truthN = sum(when(col("__truth"), 1L).otherwise(0L)).as("__truth_n")
    joined.select(col("__score"), col("__truth"), grid)
      .groupBy("threshold")
      .agg(tp, fp, truthN)
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
}
