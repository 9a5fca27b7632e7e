package graft

import org.apache.spark.sql.functions._
import graft.operators.Evaluation

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("threshold sweep: hand-checked tp/fp/fn and metrics, unscored truth = fn") {
    // scored pairs (one row per unordered pair; (3,1) deliberately reversed
    // to exercise the least/greatest normalization)
    val scored = Seq(
      (1L, 2L, 0.95), // truth, above both thresholds
      (3L, 1L, 0.70), // truth, above 0.5 only
      (2L, 3L, 0.96), // NOT truth, above both (fp)
      (4L, 5L, 0.10)  // not truth, below both (true negative)
    ).toDF("id_a", "id_b", "score")
    val truth = Seq(
      (1L, 2L),
      (1L, 3L), // matches the reversed scored row
      (6L, 7L)  // never scored: fn at EVERY threshold
    ).toDF("id_a", "id_b")
    val rows = Evaluation.thresholdSweep(scored, truth, Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(rows.keySet == Set(0.5, 0.9))
    // t=0.5: tp={12,13}, fp={23}, fn={67}
    val (tp5, fp5, fn5, p5, r5, f5) = rows(0.5)
    assert((tp5, fp5, fn5) == ((2L, 1L, 1L)))
    assert(p5 == 2.0 / 3 && r5 == 2.0 / 3 && f5 == 4.0 / 6)
    // t=0.9: tp={12}, fp={23}, fn={13,67}
    val (tp9, fp9, fn9, p9, r9, f9) = rows(0.9)
    assert((tp9, fp9, fn9) == ((1L, 1L, 2L)))
    assert(p9 == 0.5 && r9 == 1.0 / 3 && f9 == 2.0 / 5)
  }

  test("threshold sweep: zero-denominator metrics are 0.0, not NaN/null") {
    val scored = Seq((1L, 2L, 0.1)).toDF("id_a", "id_b", "score")
    val noTruth = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val r = Evaluation.thresholdSweep(scored, noTruth, Seq(0.9)).head()
    // nothing predicted at 0.9 and no truth: every denominator is 0
    assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("B-cubed: textbook example, averages per node not per cluster") {
    // pred {1,2},{3} vs truth {1},{2,3}:
    //   node 1: P=1/2 R=1;  node 2: P=1/2 R=1/2;  node 3: P=1 R=1/2
    // B3P = B3R = 2/3, F1 = 2/3
    val pred = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("node", "cluster")
    val truth = Seq((1L, 100L), (2L, 200L), (3L, 200L)).toDF("node", "cluster")
    val r = Evaluation.bcubed(pred, truth).head()
    assert(r.getLong(0) == 3)
    assert(math.abs(r.getDouble(1) - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getDouble(3) - 2.0 / 3) < 1e-12)
    // identical clusterings score a perfect 1.0 everywhere
    val p = Evaluation.bcubed(pred, pred).head()
    assert(p.getDouble(1) == 1.0 && p.getDouble(2) == 1.0 && p.getDouble(3) == 1.0)
    // unlabeled nodes are excluded (inner join): dropping node 3's label
    // leaves the {1,2}-vs-{1},{2} comparison
    val r2 = Evaluation.bcubed(pred, truth.filter($"node" =!= 3L)).head()
    assert(r2.getLong(0) == 2)
    assert(math.abs(r2.getDouble(1) - 0.5) < 1e-12) // both nodes: P=1/2
    assert(r2.getDouble(2) == 1.0)                  // singleton truth: R=1
    // empty labeled intersection: zero nodes, 0.0 metrics (not null/NaN)
    val e = Evaluation.bcubed(pred, truth.filter($"node" > 100L)).head()
    assert(e.getLong(0) == 0 && e.getDouble(1) == 0.0 && e.getDouble(3) == 0.0)
  }

  test("threshold sweep is one join + one aggregate: no per-threshold rescan") {
    val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.4)).toDF("id_a", "id_b", "score")
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    val plan = Evaluation.thresholdSweep(scored, truth, Seq(0.3, 0.5, 0.7, 0.9))
      .queryExecution.optimizedPlan.toString
    // exactly one PAIR-scale join plus the constant-size grid join (the
    // left join that guarantees a row per threshold), and one Generate (the
    // threshold explode) — the pair tables are never re-joined per threshold
    assert("(?s)Join".r.findAllIn(plan).size == 2, plan)
    assert("(?s)Generate".r.findAllIn(plan).size == 1, plan)
    // the labeled variant's ONLY join is the constant-size grid join
    val labeled = scored.withColumn("truth", col("id_a") === 1)
    val lplan = Evaluation.thresholdSweepLabeled(labeled, "truth", Seq(0.5, 0.9))
      .queryExecution.optimizedPlan.toString
    assert("(?s)Join".r.findAllIn(lplan).size == 1, lplan)
  }

  test("sweep honors the row-per-threshold contract on EMPTY input; NaN = unscored") {
    val empty = spark.emptyDataset[(Long, Long, Double)].toDF("id_a", "id_b", "score")
    val rows = Evaluation.thresholdSweep(empty, empty, Seq(0.7, 0.8, 0.9)).collect()
    assert(rows.length == 3) // one row per threshold, all-zero counts
    assert(rows.forall(r => r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0))
    // NaN scores: Spark orders NaN above every double — without the guard a
    // NaN would count as a positive prediction at every threshold
    val nan = Seq((1L, 2L, Double.NaN, true), (3L, 4L, 0.99, false))
      .toDF("id_a", "id_b", "score", "truth")
    val r = Evaluation.thresholdSweepLabeled(nan, "truth", Seq(0.5)).head()
    assert(r.getLong(1) == 0 && r.getLong(2) == 1 && r.getLong(3) == 1) // tp=0 fp=1 fn=1
  }

  test("labeled sweep == two-table sweep when truth rides the scored table") {
    val pairs = Seq(
      (1L, 2L, 0.95, true), (1L, 3L, 0.70, true),
      (2L, 3L, 0.96, false), (4L, 5L, 0.10, false)
    ).toDF("id_a", "id_b", "score", "truth")
    val viaJoin = Evaluation.thresholdSweep(
      pairs, pairs.filter($"truth"), Seq(0.5, 0.9)).collect().toSeq
    val viaLabel = Evaluation.thresholdSweepLabeled(
      pairs, "truth", Seq(0.5, 0.9)).collect().toSeq
    assert(viaLabel == viaJoin)
  }
}
