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

  test("threshold sweep is one join + one aggregate: no per-threshold rescan") {
    val scored = Seq((1L, 2L, 0.9), (2L, 3L, 0.4)).toDF("id_a", "id_b", "score")
    val truth = Seq((1L, 2L)).toDF("id_a", "id_b")
    val plan = Evaluation.thresholdSweep(scored, truth, Seq(0.3, 0.5, 0.7, 0.9))
      .queryExecution.optimizedPlan.toString
    // one Join node and one Generate (the threshold explode), regardless of
    // grid size — the pair tables are never re-joined per threshold
    assert("(?s)Join".r.findAllIn(plan).size == 1, plan)
    assert("(?s)Generate".r.findAllIn(plan).size == 1, plan)
  }
}
