package graft

import org.apache.spark.sql.functions._
import graft.config._
import graft.operators._
import graft.sources.WebCorpus

/** North-rule end-to-end: blocking + pairwise scoring + transitive
  * clustering over the Common-Crawl-style table, pairwise F1 >= 0.99 on
  * labeled pairs at the fixed blocking key (BASELINE.md targets).
  */
class WebLinkageSpec extends SparkSpec {

  private val params = WebCorpus.Params(nBase = 2000, dupFraction = 0.3, nHosts = 40)

  test("corpus is deterministic (byte-identical text per url across runs)") {
    def checksum() = WebCorpus.table(spark, params)
      .agg(sum(xxhash64(col("url"), col("text"), col("lang"), col("html"))
        .cast("decimal(38,0)")))
      .head().getDecimal(0)
    val h1 = checksum()
    val h2 = checksum()
    assert(h1 == h2)
    // and urls are unique
    val n = WebCorpus.table(spark, params).count()
    assert(WebCorpus.table(spark, params).select("url").distinct().count() == n)
  }

  test("openVocab adds a rare-token tail; the default corpus is byte-unchanged") {
    import graft.textops.Dedup
    def vocabStats(p: WebCorpus.Params) = {
      val dfT = WebCorpus.pages(spark, p)
        .select(explode(Dedup.distinctTokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .groupBy("t").agg(count(lit(1)).as("df"))
      (dfT.count(), dfT.filter(col("df") <= 2).count(), dfT.agg(min("df")).head().getLong(0))
    }
    val (closedV, closedRare, closedMin) = vocabStats(params)
    val (openV, openRare, openMin) = vocabStats(params.copy(openVocab = true))
    // closed dictionary: bounded vocabulary, no rare tail
    assert(closedV <= 2000 && closedRare == 0 && closedMin > 10)
    // open mode: a large near-hapax tail exists (the Zipfian precondition
    // rare-token techniques rely on)
    assert(openV > closedV * 5, s"open vocab $openV vs closed $closedV")
    assert(openRare > openV / 2, s"rare tail $openRare of $openV")
    assert(openMin <= 2)
    // dups still share their base page's rare tokens: near-dup pairs stay
    // discoverable by rare-token candidates in open mode
    val open = WebCorpus.pages(spark, params.copy(openVocab = true))
      .select(col("page_id").as("doc_id"), col("text"))
    val pairs = graft.textops.Similarity
      .prefixCosinePairs(open.filter(col("doc_id") / 1000000L < 150),
        "doc_id", "text", 0.9)
    assert(pairs.count() > 0)
  }

  private lazy val linkResult: (Linker.LinkResult, Long) = {
    val pages = WebCorpus.pages(spark, params)
      .withColumn("host", Blocking.host(col("url")))
      .withColumn("title",
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("text_head", substring(col("text"), 1, 80))
      .withColumn("block", concat_ws("|", col("host"), col("lang")))
    val cfg = MatchConfig(
      idA = "id_a", idB = "id_b",
      comparisons = ComparisonGroup(
        name = "web",
        variables = Seq(
          VariableSpec("title", "jarowinkler", cutA = 0.92, cutB = 0.88),
          VariableSpec("text_head", "levenshtein", cutA = 0.90, cutB = 0.75),
          VariableSpec("n_tokens", "numeric", cutA = 1, cutB = 3))))
    // dedupe-mode: same table on both sides, blocked on host+lang; the
    // id_a < id_b cut halves the pair space
    val sideA = pages.select(col("page_id").as("ida"), col("title"), col("text_head"),
      col("n_tokens"), col("block"))
    val sideB = pages.select(col("page_id").as("idb"), col("title"), col("text_head"),
      col("n_tokens"), col("block"))
    val cfg2 = cfg.copy(idA = "ida", idB = "idb")
    val res = Linker.link(sideA, sideB, cfg2, blockCols = Seq("block"))
    val dedup = res.copy(pairs = res.pairs.filter(col("id_a") < col("id_b")).cache())
    (dedup, pages.count())
  }

  test("pairwise F1 >= 0.99 on labeled pairs at the fixed blocking key") {
    val (res, _) = linkResult
    val predicted = res.matches().select(col("id_a"), col("id_b"))
      .withColumn("pred", lit(true))
    val labels = WebCorpus.labeledPairs(spark, params)
    val joined = labels.join(predicted, Seq("id_a", "id_b"), "left")
      .select(col("is_dup"), coalesce(col("pred"), lit(false)).as("pred"))
      .cache()
    val tp = joined.filter(col("is_dup") && col("pred")).count().toDouble
    val fp = joined.filter(!col("is_dup") && col("pred")).count().toDouble
    val fn = joined.filter(col("is_dup") && !col("pred")).count().toDouble
    val precision = tp / (tp + fp)
    val recall = tp / (tp + fn)
    val f1 = 2 * precision * recall / (precision + recall)
    info(f"precision=$precision%.4f recall=$recall%.4f f1=$f1%.4f (tp=$tp fp=$fp fn=$fn)")
    assert(f1 >= 0.99, f"F1 $f1%.4f < 0.99")
  }

  test("composite host+lang+band blocking reaches cross-host mirrors that host blocking cannot") {
    // plant cross-site mirrors: copies of 50 pages under a different host
    // page_id = base_id*1e6 + dup_idx; with dupFraction=0 the +1 slot is
    // free, so mirror id = page_id + 1 is unique and sorts after its source
    val base = WebCorpus.pages(spark, params.copy(nBase = 500, dupFraction = 0.0))
    val mirrors = base.filter((col("page_id") / 1000000L).cast("long") % 10 === 0)
      .select((col("page_id") + 1L).as("page_id"),
        concat(lit("https://mirror.example.org/copy/"), col("page_id")).as("url"),
        col("text"), col("lang"))
    val corpus = base.select("page_id", "url", "text", "lang").union(mirrors).cache()
    val keys = Blocking.webPageBlockKeys(corpus, "page_id", "url", "lang", "text")
    val cands = Blocking.multiKeyCandidatePairs(keys).cache()
    val n = corpus.count()
    // every planted mirror pair is a candidate, despite sharing NO host
    val mirrorPairs = mirrors.select((col("page_id") - 1L).as("id_a"),
      col("page_id").as("id_b"))
    val missed = mirrorPairs.join(cands, Seq("id_a", "id_b"), "left_anti").count()
    assert(missed == 0, s"$missed cross-host mirror pairs unreachable")
    // host+lang-only blocking provably misses ALL of them
    val hostOnly = Blocking.pairsWithinBlocks(
      corpus.withColumn("hl", concat_ws("|", Blocking.host(col("url")), col("lang"))),
      "hl", "page_id")
    assert(mirrorPairs.join(hostOnly, Seq("id_a", "id_b"), "left_semi").count() == 0)
    // and the composite candidate set stays far below all-pairs
    val all = n * (n - 1) / 2
    assert(cands.count() < all / 5, s"${cands.count()} candidates of $all possible")
  }

  test("transitive clustering recovers planted clusters") {
    val (res, _) = linkResult
    val comps = ConnectedComponents.clusterPairs(res.matches())
    // every matched pair must land in one component
    val pairs = res.matches().select(col("id_a"), col("id_b"))
    val withComp = pairs
      .join(comps.withColumnRenamed("node", "id_a").withColumnRenamed("component", "ca"), "id_a")
      .join(comps.withColumnRenamed("node", "id_b").withColumnRenamed("component", "cb"), "id_b")
    assert(withComp.filter(col("ca") =!= col("cb")).count() == 0)
    // clusters correspond to planted cluster ids (page_id / 1000000 = base)
    val purity = comps
      .withColumn("truth", (col("node") / 1000000L).cast("long"))
      .groupBy("component")
      .agg(countDistinct("truth").as("k"))
    val impure = purity.filter(col("k") > 1).count()
    val total = purity.count()
    info(s"components=$total impure=$impure")
    assert(impure.toDouble / total <= 0.01)
  }
}
