package graft

import org.apache.spark.sql.functions._
import graft.config._
import graft.operators._
import graft.sources.CsvFixtures

/** End-to-end parity with the reference's own test suite
  * (`/root/reference/test/runtests.jl:62-81`): same fixtures (dfA 500 rows,
  * dfB 350 rows, re-shipped at src/test/resources), same 4-variable config
  * (3x jarowinkler partial 0.92/0.88 w=0.1 + housenum numeric 1/2,
  * threshold 0.85), all-pairs comparison. Golden assertions:
  *   1. sum of counts of patterns with zeta >= 0.85 == 50
  *   2. number_of_unique_patterns == 26
  *   3. sum of all pattern counts == 500*350 = 175,000
  *   4. p_u >= 0.999   5. p_m <= 0.0005
  */
class FastLinkParitySpec extends SparkSpec {

  private lazy val cfg = MatchConfig(
    idA = "ida", idB = "idb",
    comparisons = ComparisonGroup(
      name = "total",
      variables = Seq(
        VariableSpec("firstname", "jarowinkler", cutA = 0.92, cutB = 0.88, partial = true, w = 0.1),
        VariableSpec("middlename", "jarowinkler", cutA = 0.92, cutB = 0.88, partial = true, w = 0.1),
        VariableSpec("lastname", "jarowinkler", cutA = 0.92, cutB = 0.88, partial = true, w = 0.1),
        VariableSpec("housenum", "numeric", cutA = 1, cutB = 2, partial = true))))

  private lazy val result: Linker.LinkResult = {
    // uppercase the three name columns, as the reference test does
    // (runtests.jl:25-28)
    def prep(path: String, id: String) = {
      val df = CsvFixtures.readWithRowId(spark, resource(path), id)
      Seq("firstname", "middlename", "lastname").foldLeft(df) { (acc, c) =>
        acc.withColumn(c, upper(col(c)))
      }
    }
    val dfA = prep("dfA.csv", "ida")
    val dfB = prep("dfB.csv", "idb")
    Linker.link(dfA, dfB, cfg) // no blocking: all 175,000 pairs
  }

  test("total comparisons = 500 x 350") {
    assert(result.em.patterns.map(_.count).sum == 175000L)
    assert(result.em.numberOfComparisons == 175000L)
  }

  test("26 unique gamma patterns") {
    assert(result.em.numberOfUniquePatterns == 26)
  }

  test("50 matched pairs at zeta >= 0.85") {
    val matchedCounts = result.em.matchedPatterns.map(_.count).sum
    assert(matchedCounts == 50L)
    // and the distributed pair table agrees with the driver-side EM
    assert(result.matches().count() == 50L)
  }

  test("p_u >= 0.999 and p_m <= 0.0005") {
    assert(result.em.pU >= 0.999, s"p_u = ${result.em.pU}")
    assert(result.em.pM <= 0.0005, s"p_m = ${result.em.pM}")
  }

  test("EM converged and posteriors are probabilities") {
    assert(result.em.converged)
    result.em.patterns.foreach { p =>
      assert(p.zeta >= 0 && p.zeta <= 1)
    }
    result.em.pGammaKM.foreach { v =>
      assert(math.abs(v.sum - 1.0) < 1e-9)
      assert(v.sorted == v) // monotone: higher agreement => larger m-prob
    }
    result.em.pGammaKU.foreach { v =>
      assert(math.abs(v.sum - 1.0) < 1e-9)
      assert(v.sorted.reverse == v)
    }
  }

  test("FastLink facade: reference JSON config reproduces the goldens; dedupe mode") {
    // the reference's README/JSON config shape, verbatim field names
    val json =
      """{
        | "idvar": ["ida", "idb"],
        | "link_type": "link_only",
        | "comparisons": {
        |   "name": "total",
        |   "threshold_match": 0.85,
        |   "variables": [
        |     {"varname": "firstname", "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88, "w": 0.1},
        |     {"varname": "middlename", "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88, "w": 0.1},
        |     {"varname": "lastname", "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88, "w": 0.1},
        |     {"varname": "housenum", "method": "numeric", "cut_a": 1, "cut_b": 2}
        |   ]
        | }
        |}""".stripMargin
    def prep(path: String, id: String) = {
      val df = CsvFixtures.readWithRowId(spark, resource(path), id)
      Seq("firstname", "middlename", "lastname").foldLeft(df)(
        (acc, c) => acc.withColumn(c, upper(col(c))))
    }
    val out = FastLink.link(prep("dfA.csv", "ida"), prep("dfB.csv", "idb"), json)
    assert(out.idvar == (("ida", "idb")))
    assert(out.resultsEM.numberOfUniquePatterns == 26)
    assert(out.resultsEM.matchedPatterns.map(_.count).sum == 50L)
    assert(out.getMatches().count() == 50L)
    assert(out.patternsW.count() == 26)
    // per-pattern id pairs: the matched patterns' pair sets sum to 50
    val matchedIds = out.patternsW.filter(col("zeta_j") >= 0.85)
      .select("pattern_id").collect().map(_.getInt(0))
    assert(matchedIds.map(out.idPairs(_).count()).sum == 50L)
    // tfAdjTable has the ones-shape for a no-TF config
    assert(out.tfAdjTable.columns.count(_.startsWith("tf_")) == 8)

    // dedupe mode: self-link of dfA on a constant block, unordered pairs
    // once — and the id_a < id_b cut applies BEFORE pattern aggregation/EM,
    // so the estimator never sees the 500 guaranteed-all-agree self-pairs
    // (which would bias p_m upward) nor each unordered pair twice.
    val dfA = prep("dfA.csv", "ida").withColumn("block", lit(1))
    val dd = FastLink.dedupe(dfA, cfg.copy(idA = "ida"), blockCols = Seq("block"))
    assert(dd.em.patterns.map(_.count).sum == 500L * 499 / 2)
    assert(dd.pairs.count() == 500L * 499 / 2) // each unordered pair once
    // the comparison space EM scales against matches what it actually saw
    assert(dd.em.numberOfComparisons == 500L * 499 / 2)

    // link_type dispatch: a dedupe_only config must NOT silently run A x B
    val ddJson = json.replace("\"link_type\": \"link_only\"",
      "\"link_type\": \"dedupe_only\"")
    assert(MatchConfig.fromJson(ddJson).linkType == "dedupe_only")
    val ddOut = FastLink.link(dfA, dfA, ddJson, blockCols = Seq("block"))
    assert(ddOut.resultsEM.patterns.map(_.count).sum == 500L * 499 / 2)

    // link_and_dedupe: DIFFERENT id column names must reconcile before the
    // stack (idb renamed to ida), and the comparison space is the stacked
    // table's unordered pairs. Ids are made disjoint explicitly — the 50
    // true-match rows are byte-identical across the two fixture files, so
    // their row-hash ids would collide, and a shared id value turns a
    // legitimate cross-table pair into a dropped self-pair (the documented
    // cross-table id-uniqueness contract; first caught by exactly this
    // test reading 360775 != 360825).
    val ldJson = json.replace("\"link_type\": \"link_only\"",
      "\"link_type\": \"link_and_dedupe\"")
    val ldA = dfA.withColumn("ida", abs(col("ida"))) // non-negative ids
    val ldB = prep("dfB.csv", "idb").withColumn("block", lit(1))
      .withColumn("idb", -abs(col("idb")) - 1) // strictly negative ids
    val ld = FastLink.link(ldA, ldB, ldJson, blockCols = Seq("block"))
    assert(ld.resultsEM.patterns.map(_.count).sum == 850L * 849 / 2)
    assert(ld.resultsEM.numberOfComparisons == 850L * 849 / 2)

    // intersecting id domains must FAIL FAST (runtime contract enforcement),
    // not silently drop cross-table pairs as self-pairs: abs() on both sides
    // makes the 50 byte-identical fixture rows' row-hash ids collide
    val ldBClash = prep("dfB.csv", "idb").withColumn("block", lit(1))
      .withColumn("idb", abs(col("idb")))
    val clash = intercept[IllegalArgumentException] {
      FastLink.link(ldA, ldBClash, ldJson, blockCols = Seq("block"))
    }
    assert(clash.getMessage.contains("unique ACROSS"), clash.getMessage)
  }

  test("empty input side (e.g. empty increment table) degrades gracefully") {
    // AQE empty-relation propagation eliminates the observed scan's
    // CollectMetrics node; the side-count fallback + EmLink's empty-pattern
    // contract must yield a clean zero-match result, not an obscure
    // NoSuchElementException or NaN EM parameters
    import spark.implicits._
    val eCfg = MatchConfig(idA = "ida", idB = "idb",
      comparisons = ComparisonGroup(name = "t", variables = Seq(
        VariableSpec("name", "jarowinkler", cutA = 0.92, cutB = 0.88),
        VariableSpec("num", "numeric", cutA = 1, cutB = 2))))
    val a = Seq((1L, "alpha", 10.0, "b1"), (2L, "beta", 20.0, "b1"))
      .toDF("ida", "name", "num", "block")
    val b = a.filter(lit(false)).toDF("idb", "name", "num", "block")
    val res = Linker.link(a, b, eCfg, blockCols = Seq("block"))
    assert(res.matches().count() == 0)
    assert(res.em.numberOfComparisons == 0)
    assert(res.em.converged && !res.em.pM.isNaN && res.em.patterns.isEmpty)
  }

  test("distinct-value rewrite yields identical gammas") {
    // the pooled-kernel plan shape (score distinct value pairs, broadcast
    // back) must be a pure optimization: same gamma distribution
    def prep(path: String, id: String) = {
      val df = CsvFixtures.readWithRowId(spark, resource(path), id)
      Seq("firstname").foldLeft(df)((acc, c) => acc.withColumn(c, upper(col(c))))
    }
    val dfA = prep("dfA.csv", "ida").select(col("ida"), col("firstname"))
    val dfB = prep("dfB.csv", "idb").select(col("idb"), col("firstname"))
    val spec = VariableSpec("firstname", "jarowinkler", cutA = 0.92, cutB = 0.88)
    val pairs = dfA.withColumnRenamed("firstname", "firstname_a")
      .crossJoin(dfB.withColumnRenamed("firstname", "firstname_b"))
    val plain = Gamma.addGammaColumns(pairs, Seq(spec))
      .groupBy("gamma_firstname").count().collect()
      .map(r => r.getByte(0) -> r.getLong(1)).toMap
    val rewritten = Gamma.addGammaColumnDistinct(pairs, spec)
      .groupBy("gamma_firstname").count().collect()
      .map(r => r.getByte(0) -> r.getLong(1)).toMap
    assert(plain == rewritten)
  }
}
