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

  test("tfAdjTable exports per-pair raw TF values for every variable (T6)") {
    val tab = result.tfAdjTable
    // all vars present, ones where no TF was computed (reference initializes
    // TF vectors to 1.0, term_frequency_adjustment.jl:140-156)
    val expected = Seq("id_a", "id_b", "pattern_id",
      "tf_firstname_a", "tf_firstname_b", "tf_lastname_a", "tf_lastname_b",
      "tf_housenum_a", "tf_housenum_b", "tf_streetname_a", "tf_streetname_b")
    assert(tab.columns.toSeq == expected)
    assert(tab.count() == 175000L)
    val row = tab.filter(col("tf_lastname_a") =!= 1.0).head()
    assert(row.getAs[Double]("tf_firstname_a") == 1.0) // non-TF var -> ones
    val tfRange = tab.agg(min("tf_lastname_a"), max("tf_lastname_a")).head()
    assert(tfRange.getDouble(0) >= 0.0 && tfRange.getDouble(1) <= 1.0)
    // per-pattern table (the reference's output shape) is one filter away
    val pat0 = tab.filter(col("pattern_id") === 0)
    assert(pat0.count() > 0)
  }

  test("seeded random Dirichlet EM init converges to the deterministic fixed point") {
    // same pattern table, three inits: deterministic + two seeds — the EM
    // must land on the same matched set and near-identical p_m/p_u
    // (reference emlink.jl:119-121 draws randomly; its own tests tolerate
    // any seed)
    val vars = Seq("firstname", "lastname", "address")
    val patterns = result.em.patterns.map(p => EmLink.Pattern(p.gammas, p.count))
    val det = EmLink.run(patterns, (500L, 350L), vars)
    Seq(1L, 42L).foreach { seed =>
      val rnd = EmLink.run(patterns, (500L, 350L), vars,
        EmOptions(initSeed = Some(seed)))
      assert(math.abs(rnd.pM - det.pM) < 1e-6, s"seed $seed pM ${rnd.pM} vs ${det.pM}")
      assert(math.abs(rnd.pU - det.pU) < 1e-6)
      val mDet = det.patterns.filter(_.zeta >= 0.85).map(_.gammas.toSeq).toSet
      val mRnd = rnd.patterns.filter(_.zeta >= 0.85).map(_.gammas.toSeq).toSet
      assert(mDet == mRnd, s"seed $seed matched-pattern set differs")
    }
  }

  test("hierarchical driver query: pattern totals cover every pair (q_hierarchical identity)") {
    val df = SparkEntry.queries("q_hierarchical")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("counts")).sum
    // the link pattern table covers the full blocked AxB cross (both orders
    // + self-pairs — the reference's `sum counts == nrowA*nrowB` identity,
    // blocked): sum over blocks of n^2
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val pairTotal = c.groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .agg(sum((col("n") * col("n")).cast("long"))).head().getLong(0)
    assert(total == pairTotal, s"sum(counts)=$total != $pairTotal")
    // child verdict is binary in the parent's pattern table
    assert(rows.map(_.getAs[Int]("gamma_namegrp")).toSet.subsetOf(Set(0, 2)))
  }

  test("converged flag: convergence exactly at iter == iterMax is still converged") {
    // deterministic separable pattern table, pure driver-side EM
    val vars = Seq("a", "b")
    val pats = Seq(
      EmLink.Pattern(Array(2, 2), 50),
      EmLink.Pattern(Array(2, 0), 30),
      EmLink.Pattern(Array(0, 2), 20),
      EmLink.Pattern(Array(0, 0), 10000))
    val full = EmLink.run(pats, (500L, 350L), vars)
    assert(full.converged)
    // iterConverge is post-increment: the loop completed iterConverge - 1
    // iterations, the last of which drove delta below tol
    val k = full.iterConverge - 1
    assert(k >= 2, s"fixture converges trivially (k=$k); pick a harder one")
    // budget of EXACTLY k iterations: delta first drops below tol at
    // iter == iterMax — the old `iter <= iterMax` post-increment comparison
    // mislabeled this run unconverged
    val exact = EmLink.run(pats, (500L, 350L), vars, EmOptions(iterMax = k))
    assert(exact.converged, s"converged at iter == iterMax ($k) mislabeled")
    assert(exact.iterConverge == full.iterConverge && exact.pM == full.pM)
    // one fewer iteration genuinely does NOT converge
    assert(!EmLink.run(pats, (500L, 350L), vars, EmOptions(iterMax = k - 1)).converged)
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
