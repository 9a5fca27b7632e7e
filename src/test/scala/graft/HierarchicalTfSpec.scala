package graft

import org.apache.spark.sql.functions._
import graft.config._
import graft.operators._
import graft.sources.CsvFixtures

/** Hierarchical stages (reference H1-H3, patterns.jl:232-259) + term
  * frequency adjustment (T1-T5) on the reference fixture — the
  * `test_parameters.json` shape, structurally asserted (the reference ships
  * no golden values for this path, only the informal scratch.jl run).
  */
class HierarchicalTfSpec extends SparkSpec {

  private def prep(path: String, id: String) = {
    val df = CsvFixtures.readWithRowId(spark, resource(path), id)
    Seq("firstname", "middlename", "lastname", "streetname", "city")
      .foldLeft(df)((acc, c) => acc.withColumn(c, upper(col(c))))
  }

  private lazy val cfg = MatchConfig(
    idA = "ida", idB = "idb",
    comparisons = ComparisonGroup(
      name = "total",
      variables = Seq(
        VariableSpec("firstname", "jarowinkler", cutA = 0.92, cutB = 0.88),
        VariableSpec("lastname", "jarowinkler", cutA = 0.92, cutB = 0.88,
          tfAdjust = true)),
      children = Seq(ComparisonGroup(
        name = "address",
        variables = Seq(
          VariableSpec("housenum", "numeric", cutA = 1, cutB = 2),
          VariableSpec("streetname", "jarowinkler", cutA = 0.92, cutB = 0.88,
            tfAdjust = true, tfAdjustmentWeight = 0.25)),
        em = EmOptions(thresholdMatch = 0.92)))))

  private lazy val result = Linker.link(prep("dfA.csv", "ida"), prep("dfB.csv", "idb"), cfg)

  test("child stage ran and produced a binary synthetic gamma") {
    assert(result.childStages.map(_.group.name) == Seq("address"))
    val vals = result.pairs.select("gamma_address").distinct().collect()
      .map(_.getByte(0)).toSet
    assert(vals.subsetOf(Set[Byte](0, 2)))
    assert(result.em.varnames == Seq("firstname", "lastname", "address"))
  }

  test("pattern counts still cover all pairs") {
    assert(result.em.patterns.map(_.count).sum == 175000L)
  }

  test("TF adjustment: pair-level final_zeta in [0,1], rarer agreement upweighted") {
    val pairs = result.pairs
    assert(pairs.columns.contains("final_zeta"))
    val bad = pairs.filter(col("final_zeta") < 0 || col("final_zeta") > 1).count()
    assert(bad == 0)
    // within a single pattern with gamma_lastname=2, pairs whose lastname is
    // rarer (smaller tf) must get a final_weight >= that of commoner values
    import spark.implicits._
    val sample = pairs
      .filter(col("gamma_lastname") === 2)
      .select(col("pattern_id"), col("tf_lastname_a"), col("final_weight"), col("weights"))
      .as[(Int, Double, Double, Double)]
      .collect()
    val byPattern = sample.groupBy(_._1).values.filter(_.length > 1)
    assert(byPattern.nonEmpty)
    byPattern.foreach { grp =>
      val sorted = grp.sortBy(_._2) // ascending tf
      // monotone non-increasing final_weight as tf grows (same base weight)
      sorted.sliding(2).foreach {
        case Array(r1, r2) =>
          if (r1._2 < r2._2) assert(r1._3 >= r2._3 - 1e-9,
            s"tf ${r1._2} weight ${r1._3} vs tf ${r2._2} weight ${r2._3}")
        case _ =>
      }
    }
  }

  test("TF-adjusted matches differ from pattern-level matches only near threshold") {
    val pat = result.pairs.filter(col("zeta_j") >= 0.85).count()
    val tf = result.matches().count()
    info(s"pattern-level=$pat tf-adjusted=$tf")
    assert(tf > 0)
  }

  test("lambda prior shifts p_m upward") {
    val base = result.em.pM
    val cfgPrior = cfg.copy(comparisons = cfg.comparisons.copy(
      em = EmOptions(priorLambda = 0.01, wLambda = 0.9)))
    val withPrior = Linker.link(prep("dfA.csv", "ida"), prep("dfB.csv", "idb"), cfgPrior)
    info(s"p_m base=$base withPrior=${withPrior.em.pM}")
    assert(withPrior.em.pM > base)
  }
}
