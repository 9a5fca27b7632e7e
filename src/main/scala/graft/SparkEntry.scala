package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config._
import graft.functions.GraftFunctions
import graft.operators._
import graft.sources.WebCorpus
import graft.textops._

/** Driver contract: one `queries` entry per operator (SURVEY.md §2 + the
  * training-data ops), with a DuckDB-equivalent `oracleSql` wherever the
  * semantics are ANSI-SQL-expressible. Non-SQL operators (EM, MinHash/SimHash
  * LSH — hash-function-specific) are rows-only checks; their semantics are
  * pinned by the golden tests against the reference fixture instead
  * (FastLinkParitySpec, TextOpsSpec).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---- shared pair builders (customer dedupe-mode pairs within nation) ----
  // Parallelism is structural, not session-conf: the 25-nation blocking key
  // is salted into ~cap^2-pair cells (two-sided salted join — pair multiset
  // provably unchanged, PlanSpec) and the join output gets an explicit
  // fan-out repartition, because AQE's input-bytes coalescing would
  // otherwise run the whole quadratic fan-out on ONE task (measured round 1).
  private def pairFanout(s: SparkSession): Int =
    math.max(64, s.sparkContext.defaultParallelism * 2)

  private def customerPairs(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val side = c.select(col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"),
      col("c_nationkey").as("block"))
    val cfg = MatchConfig(idA = "id", idB = "id",
      comparisons = ComparisonGroup("cust", Seq(
        VariableSpec("name", "jarowinkler"), VariableSpec("bal", "numeric"),
        VariableSpec("seg", "exact"))))
    Linker.buildPairs(side, side, cfg, cfg.comparisons.allVariables, Seq("block"),
        maxBlockRows = Some(400L), fanoutPartitions = Some(pairFanout(s)))
      .filter(col("id_a") < col("id_b"))
  }

  private def gammaJw(a: Column, b: Column): Column = {
    val sim = round(GraftFunctions.jaroWinklerSim(a, b, 0.1), 4)
    when(a.isNull || b.isNull, lit(3))
      .when(sim >= 0.95, lit(2)).when(sim >= 0.88, lit(1)).otherwise(lit(0))
      .cast("int")
  }
  private def gammaNum(a: Column, b: Column, cutA: Double, cutB: Double): Column =
    when(a.isNull || b.isNull, lit(3))
      .when(abs(a - b) <= cutA, lit(2)).when(abs(a - b) <= cutB, lit(1)).otherwise(lit(0))
      .cast("int")
  private def gammaExact(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(3)).when(a === b, lit(2)).otherwise(lit(0)).cast("int")
  private def gammaSim(sim: Column, a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(3))
      .when(round(sim, 4) >= 0.92, lit(2)).when(round(sim, 4) >= 0.88, lit(1))
      .otherwise(lit(0)).cast("int")

  private val jwSql =
    "round(jaro_winkler_similarity(%s, %s), 4)"
  private def gammaJwSql(a: String, b: String): String = {
    val sim = jwSql.format(a, b)
    s"(CASE WHEN $a IS NULL OR $b IS NULL THEN 3 WHEN $sim >= 0.95 THEN 2 " +
      s"WHEN $sim >= 0.88 THEN 1 ELSE 0 END)"
  }
  private def gammaNumSql(a: String, b: String, cutA: Double, cutB: Double): String =
    s"(CASE WHEN $a IS NULL OR $b IS NULL THEN 3 WHEN abs($a - $b) <= $cutA THEN 2 " +
      s"WHEN abs($a - $b) <= $cutB THEN 1 ELSE 0 END)"
  private def gammaExactSql(a: String, b: String): String =
    s"(CASE WHEN $a IS NULL OR $b IS NULL THEN 3 WHEN $a = $b THEN 2 ELSE 0 END)"
  /** normalized edit-distance similarity = 1 - dist/max(len), both-empty = 1 */
  private def editSimSql(fn: String, a: String, b: String): String =
    s"round(CASE WHEN greatest(length($a), length($b)) = 0 THEN 1.0 " +
      s"ELSE 1.0 - $fn($a, $b) * 1.0 / greatest(length($a), length($b)) END, 4)"
  private def gammaEditSql(fn: String, a: String, b: String): String = {
    val sim = editSimSql(fn, a, b)
    s"(CASE WHEN $a IS NULL OR $b IS NULL THEN 3 WHEN $sim >= 0.92 THEN 2 " +
      s"WHEN $sim >= 0.88 THEN 1 ELSE 0 END)"
  }

  private val pairsSql =
    """FROM customer a JOIN customer b
      | ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey""".stripMargin

  /** normalized text (lower, strip non-alnum, collapse spaces) — SQL twin of
    * Dedup.normalizeText.
    */
  private def normSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** DuckDB twin of SpanDedup.positionalShingles: CTEs `docs` (normalized
    * token arrays), `p` (doc_id, 0-based pos, raw k-token window string —
    * the oracle groups by the STRING where the engine groups by its xxhash64,
    * so an engine-side hash collision would fail the gate, not pass it).
    */
  private def spanPosSql(k: Int): String = {
    val norm = normSql("text")
    s"""docs AS (
       |  SELECT doc_id, list_filter(string_split($norm, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |shl AS (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - $k + 1),
       |    i -> {'pos': i - 1, 's': array_to_string(toks[i:i + $k - 1], chr(1))})) AS u
       |  FROM docs WHERE len(toks) >= $k),
       |p AS (SELECT doc_id, u.pos AS pos, u.s AS s FROM shl)""".stripMargin
  }

  /** DuckDB twin of SpanDedup.mergeSpans (gaps-and-islands over a running-max
    * window): CTE `spans` (doc_id, span_start, span_end) from `src`'s
    * (doc_id, pos) hit windows.
    */
  private def spanMergeSql(src: String, k: Int): String =
    s"""m1 AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > coalesce(max(pos + $k - 1) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS ng
       |  FROM $src),
       |m2 AS (SELECT doc_id, pos,
       |    sum(ng) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM m1),
       |spans AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + $k - 1 AS span_end
       |  FROM m2 GROUP BY doc_id, isl)""".stripMargin

  /** language-ID score SQL via the length-difference occurrence trick. */
  private def langScoreSql(t: String, lang: String): String =
    TextStats.stopwordMarkers(lang)
      .map(m => s"((length($t) - length(replace($t, '$m', ''))) / ${m.length})")
      .mkString("(", " + ", ")")
  private def langIdSql(textCol: String): String = {
    val t = s"(' ' || lower($textCol) || ' ')"
    val scores = Seq("en", "de", "fr", "es").map(l => l -> langScoreSql(t, l))
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scores
      .map { case (l, s) => s"WHEN $s = $best AND $best > 0 THEN '$l'" }
      .mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }

  /** EM over the 3-gamma customer pattern table (shared by q_em/q_matches).
    * Memoized per (session, dir): a user computes the EM once and both reads
    * patterns and extracts matches from the same LinkResult — running
    * q_em_patterns and q_matches in one session should not re-link.
    */
  // Single-slot memo: holding more would pin stopped sessions (and their
  // cached DataFrames) forever in a long-lived JVM that cycles sessions.
  private var emMemo: ((SparkSession, String), (Linker.LinkResult, DataFrame)) = null
  /** Bench hook: a timing rep must measure the pipeline, not a memo hit. */
  private[graft] def clearEmMemo(): Unit = synchronized { emMemo = null }
  private def customerEm(s: SparkSession, dir: String): (Linker.LinkResult, DataFrame) =
    synchronized {
      if (emMemo == null || emMemo._1 != ((s, dir)))
        emMemo = ((s, dir), customerEmUncached(s, dir))
      emMemo._2
    }

  private def customerEmUncached(s: SparkSession, dir: String): (Linker.LinkResult, DataFrame) = {
    val c = t(s, dir, "customer")
    val cfg = MatchConfig(
      idA = "id_a", idB = "id_b",
      comparisons = ComparisonGroup(
        name = "cust",
        variables = Seq(
          VariableSpec("name", "jarowinkler", cutA = 0.95, cutB = 0.88),
          VariableSpec("bal", "numeric", cutA = 100, cutB = 500),
          VariableSpec("seg", "exact")),
        em = EmOptions(thresholdMatch = 0.85)))
    val side = c.select(col("c_custkey"), col("c_name").as("name"),
      col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"),
      col("c_nationkey").as("block"))
    val res = Linker.link(
      side.withColumnRenamed("c_custkey", "ida"),
      side.withColumnRenamed("c_custkey", "idb"),
      cfg.copy(idA = "ida", idB = "idb"), blockCols = Seq("block"),
      maxBlockRows = Some(400L), fanoutPartitions = Some(pairFanout(s)))
    (res, res.pairs.filter(col("id_a") < col("id_b")))
  }

  /** Flagship: end-to-end link-and-cluster on the synthetic web corpus
    * (blocking on host+lang -> gammas -> EM -> threshold -> connected
    * components), returning matched pairs with their entity cluster.
    */
  def entry(spark: SparkSession): DataFrame = {
    val params = WebCorpus.Params(nBase = 500, dupFraction = 0.3, nHosts = 20)
    val pages = WebCorpus.pages(spark, params)
      .withColumn("host", Blocking.host(col("url")))
      .withColumn("title", concat_ws(" ", slice(split(col("text"), " "), 1, 3)))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("text_head", substring(col("text"), 1, 80))
      .withColumn("block", concat_ws("|", col("host"), col("lang")))
    val cfg = MatchConfig(
      idA = "ida", idB = "idb",
      comparisons = ComparisonGroup(
        name = "web",
        variables = Seq(
          VariableSpec("title", "jarowinkler", cutA = 0.92, cutB = 0.88),
          VariableSpec("text_head", "levenshtein", cutA = 0.90, cutB = 0.75),
          VariableSpec("n_tokens", "numeric", cutA = 1, cutB = 3))))
    def side(id: String) = pages.select(col("page_id").as(id), col("title"),
      col("text_head"), col("n_tokens"), col("block"))
    val res = Linker.link(side("ida"), side("idb"), cfg, blockCols = Seq("block"),
      maxBlockRows = Some(400L), fanoutPartitions = Some(pairFanout(spark)))
    val matched = res.matches().filter(col("id_a") < col("id_b"))
    val comps = ConnectedComponents.clusterPairs(matched)
    matched
      .join(comps.withColumnRenamed("node", "id_a"), "id_a")
      .select(col("id_a"), col("id_b"), col("zeta_j"), col("component").as("entity_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- sources / relational plumbing ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q2_join_agg" -> ((s, dir) => {
      t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("bigint")).as("revenue_cents"))
        .orderBy("c_mktsegment")
    }),
    "q3_topk_per_lang" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      t(s, dir, "documents")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("lang", "source", "rank", "doc_id", "n_chars")
        .orderBy("lang", "source", "rank")
    }),
    "q4_events_first" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("first_event_id"),
          col("event_type").as("first_event_type"))
        .orderBy("user_id")
    }),

    // ---- linkage pipeline stages ----
    "q_block_stats" -> ((s, dir) => {
      Blocking.blockSizes(t(s, dir, "customer"), col("c_nationkey"))
        .select(col("block_key").cast("int").as("block_key"), col("n"),
          ((col("n") * (col("n") - 1)) / 2).cast("bigint").as("n_pairs"))
        .orderBy("block_key")
    }),
    "q_gamma_exact" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(gammaExact(col("seg_a"), col("seg_b")).as("gamma"))
        .groupBy("gamma").agg(count(lit(1)).as("n"))
        .orderBy("gamma")
    }),
    "q_gamma_numeric" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(gammaNum(col("bal_a"), col("bal_b"), 100, 500).as("gamma"))
        .groupBy("gamma").agg(count(lit(1)).as("n"))
        .orderBy("gamma")
    }),
    "q_gamma_jw" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(gammaJw(col("name_a"), col("name_b")).as("gamma"))
        .groupBy("gamma").agg(count(lit(1)).as("n"))
        .orderBy("gamma")
    }),
    "q_gamma_lv" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(gammaSim(GraftFunctions.levenshteinSim(col("name_a"), col("name_b")),
          col("name_a"), col("name_b")).as("gamma"))
        .groupBy("gamma").agg(count(lit(1)).as("n"))
        .orderBy("gamma")
    }),
    "q_gamma_dl" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(gammaSim(GraftFunctions.damerauLevenshteinSim(col("name_a"), col("name_b")),
          col("name_a"), col("name_b")).as("gamma"))
        .groupBy("gamma").agg(count(lit(1)).as("n"))
        .orderBy("gamma")
    }),
    "q_patterns" -> ((s, dir) => {
      customerPairs(s, dir)
        .select(
          gammaJw(col("name_a"), col("name_b")).as("gamma_name"),
          gammaNum(col("bal_a"), col("bal_b"), 100, 500).as("gamma_bal"),
          gammaExact(col("seg_a"), col("seg_b")).as("gamma_seg"))
        .groupBy("gamma_name", "gamma_bal", "gamma_seg")
        .agg(count(lit(1)).as("counts"))
        .orderBy("gamma_name", "gamma_bal", "gamma_seg")
    }),
    "q_tf_table" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      TermFrequency.freqTable(c, "c_mktsegment", 0.001)
        .select(col("c_mktsegment"), round(col("tf_c_mktsegment"), 6).as("tf"))
        .orderBy("c_mktsegment")
    }),
    "q_tf_adj" -> ((s, dir) => {
      // pair-level TF columns + per-pair denominator (reference T1 + P2 +
      // tf_adj_table semantics, SQL-expressible end to end): tf values ride
      // the salted pair join, exact-method denominator = mean of both sides
      val c = t(s, dir, "customer")
      val side = c.select(col("c_custkey").as("id"),
        col("c_mktsegment").as("seg"), col("c_nationkey").as("block"))
      val spec = VariableSpec("seg", "exact", tfAdjust = true)
      val cfg = MatchConfig(idA = "id", idB = "id",
        comparisons = ComparisonGroup("tf", Seq(spec)))
      Linker.buildPairs(side, side, cfg, Seq(spec), Seq("block"),
          maxBlockRows = Some(400L), fanoutPartitions = Some(pairFanout(s)))
        .filter(col("id_a") < col("id_b"))
        .select(round(col("tf_seg_a"), 6).as("tf_seg_a"),
          round(col("tf_seg_b"), 6).as("tf_seg_b"),
          round(TermFrequency.denominator(spec), 6).as("tf_denom"))
        .groupBy("tf_seg_a", "tf_seg_b", "tf_denom")
        .agg(count(lit(1)).as("n"))
        .orderBy("tf_seg_a", "tf_seg_b", "tf_denom")
    }),
    "q_hierarchical" -> ((s, dir) => {
      // nested comparison stages (reference H1-H3): child group (name JW +
      // seg exact) runs its own EM, its thresholded verdict binarizes into
      // the synthetic gamma_namegrp of the parent EM (with bal numeric).
      // EM-dependent -> rows-only; pattern-total identity is unit-tested
      // (HierarchicalTfSpec: sum(counts) == pair count).
      val c = t(s, dir, "customer")
      val cfg = MatchConfig(
        idA = "ida", idB = "idb",
        comparisons = ComparisonGroup(
          name = "parent",
          variables = Seq(VariableSpec("bal", "numeric", cutA = 100, cutB = 500)),
          children = Seq(ComparisonGroup(
            name = "namegrp",
            variables = Seq(
              VariableSpec("name", "jarowinkler", cutA = 0.95, cutB = 0.88),
              VariableSpec("seg", "exact")),
            em = EmOptions(thresholdMatch = 0.9)))))
      val side = c.select(col("c_custkey"), col("c_name").as("name"),
        col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"),
        col("c_nationkey").as("block"))
      val res = Linker.link(
        side.withColumnRenamed("c_custkey", "ida"),
        side.withColumnRenamed("c_custkey", "idb"),
        cfg, blockCols = Seq("block"),
        maxBlockRows = Some(400L), fanoutPartitions = Some(pairFanout(s)))
      res.patternStats
        .select(col("gamma_namegrp").cast("int").as("gamma_namegrp"),
          col("gamma_bal").cast("int").as("gamma_bal"),
          col("counts"), round(col("zeta_j"), 6).as("zeta"))
        .orderBy("gamma_namegrp", "gamma_bal")
    }),
    "q_em_patterns" -> ((s, dir) => {
      // Fellegi-Sunter EM over the pattern table (driver-side; rows-only
      // check — golden-tested against the reference fixture instead)
      val (res, _) = customerEm(s, dir)
      res.patternStats
        .select(col("gamma_name").cast("int").as("gamma_name"),
          col("gamma_bal").cast("int").as("gamma_bal"),
          col("gamma_seg").cast("int").as("gamma_seg"),
          col("counts"), round(col("weights"), 6).as("weight"),
          round(col("zeta_j"), 6).as("zeta"))
        .orderBy("gamma_name", "gamma_bal", "gamma_seg")
    }),
    "q_matches" -> ((s, dir) => {
      val (res, pairs) = customerEm(s, dir)
      pairs.filter(col("zeta_j") >= res.em.thresholdMatch)
        .select(col("id_a"), col("id_b"), round(col("zeta_j"), 6).as("zeta"))
        .orderBy("id_a", "id_b")
    }),
    "q_cluster_cc" -> ((s, dir) => {
      // transitive closure: bipartite customer->nation edges; components =
      // nations (exercises large-star/small-star against a recursive-CTE
      // oracle)
      val edges = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("src"),
          (col("c_nationkey").cast("long") + 1000000L).as("dst"))
      ConnectedComponents.run(edges)
        .orderBy("node")
    }),
    "q_cluster_incr" -> ((s, dir) => {
      // incremental clustering == from-scratch over the full edge history,
      // as a DuckDB-adjudicated fact: day-1 edges (even customers) are
      // clustered first, day-2 edges (odd customers) fold in via
      // incrementalCluster — the oracle is the recursive CTE over ALL edges,
      // so any divergence from the from-scratch labeling hash-mismatches
      val edges = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("id_a"),
          (col("c_nationkey").cast("long") + 1000000L).as("id_b"))
      val day1 = edges.filter(pmod(col("id_a"), lit(2)) === 0)
      val day2 = edges.filter(pmod(col("id_a"), lit(2)) === 1)
      ConnectedComponents.incrementalCluster(
        ConnectedComponents.clusterPairs(day1), day2)
        .orderBy("node")
    }),

    // ---- training-data ops ----
    "q_dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // plant exact duplicates: every 5th doc re-emitted with offset id
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactGroups(corpus, "doc_id", "text")
        .select(col("text_hash"), col("n_docs"), col("keeper_id"))
        .orderBy("text_hash")
    }),
    "q_dedup_canonical" -> ((s, dir) => {
      // keep-policy dedup: every doc maps to the best (max pref, min id)
      // copy of its normalized text — corpus = documents + planted dups
      val d = t(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .withColumn("pref", pmod(col("doc_id") * 31, lit(97)))
      Dedup.canonicalize(corpus, "doc_id", "text", "pref")
        .select("doc_id", "canonical_id")
        .orderBy("doc_id")
    }),
    "q_token_freq" -> ((s, dir) => {
      // corpus vocabulary: normalized-token frequencies with doc counts
      TextStats.tokenFrequencies(t(s, dir, "documents"), "doc_id", "text", minCount = 5)
        .orderBy("token")
    }),
    "q_sample_split" -> ((s, dir) => {
      // deterministic hash-split (train/val) — engine-portable md5 rule
      Sampling.hashSplit(t(s, dir, "documents"), "doc_id", trainFraction = 0.8)
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))
        .orderBy("split", "lang")
    }),
    "q_contamination" -> ((s, dir) => {
      // benchmark-contamination: planted bench copies of every 5th doc must
      // surface their train-side source via shared 3-gram shingles
      val d = t(s, dir, "documents")
      val bench = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.contaminationPairs(bench, d, "doc_id", "text",
          shingleSize = 3, minShared = 5, maxShingleDf = 1000)
        .orderBy("bench_id", "train_id")
    }),
    "q_dedup_jaccard" -> ((s, dir) => {
      // tokens materialized per doc BEFORE the pair join (array lambdas are
      // interpreted, so they must run O(rows), not O(pairs))
      val d = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("lang"), col("source"), col("doc_id"),
          Dedup.distinctTokens(col("text")).as("toks"))
      val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"),
        col("toks").as("ta"))
      val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"),
        col("toks").as("tb"))
      a.join(b, Seq("lang", "source")).filter(col("id_a") < col("id_b"))
        .withColumn("jaccard", round(Dedup.jaccardArrays(col("ta"), col("tb")), 6))
        .filter(col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }),
    "q_dedup_minhash" -> ((s, dir) => {
      // MinHash+LSH candidates verified by true n-gram jaccard; the oracle
      // recomputes the jaccard of every EMITTED pair from the documents
      // table (value + threshold adjudicated; candidate recall vs brute
      // force is unit-tested in TextOpsSpec)
      Dedup.minhashDupPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, shingleSize = 3, numHashes = 32, bands = 16)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "q_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashDupPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 10)
        .orderBy("id_a", "id_b")
    }),
    "q_cosine_join" -> ((s, dir) => {
      // lossless prefix-filtered IDF-weighted cosine self-join (AllPairs /
      // prefix-filtering): complete at the threshold by construction — the
      // oracle recomputes EVERY qualifying pair brute-force in DuckDB, so a
      // single missed candidate or wrong weight hash-mismatches the gate.
      // Scoped to the en subset at a tight near-dup threshold: the synthetic
      // corpus is small-vocabulary templated text, so a loose global join
      // emits ~half of ALL pairs — data pathology, not operator shape
      Similarity.prefixCosinePairs(
          t(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text", 0.95)
        .orderBy("id_a", "id_b")
    }),
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 30), "vec_id", "embedding", 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),
    "q_ann_srp" -> ((s, dir) => {
      // bucketed ANN (hash-derived hyperplanes -> rows-only check; exactness
      // vs brute force within bucket is unit-tested)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      Similarity.srpTopK(e, e.filter(col("vec_id") < 30), "vec_id", "embedding",
        k = 3, planes = 6)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),
    "q_dedup_embedding" -> ((s, dir) => {
      // embedding-cosine near-dup pairs, brute-force (oracle-expressible)
      // form; the SRP-LSH scale path over the same kernel is unit-tested
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      Similarity.bruteForceDupPairs(e, "vec_id", "v", 0.4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "q_ann_ivf" -> ((s, dir) => {
      // IVF plumbing with exhaustive probe (nProbe = nCells) — exactly
      // brute-force top-k regardless of centroid placement, so it shares
      // q_ann_topk's oracle while still exercising the k-means refinement;
      // the partial-probe recall path is unit-tested (TextOpsSpec)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 30), "vec_id", "embedding",
        k = 3, nCells = 8, nProbe = 8, kmeansIters = 1)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf_index" -> ((s, dir) => {
      // the PERSISTED cell-partitioned IVF index end-to-end in the driver
      // gate: write (shuffle-free argmax assignment + partitionBy(cell) +
      // centroid sidecar) then query with an exhaustive probe — identical to
      // brute force, so it shares q_ann_topk's oracle; the partial-probe
      // partition-pruning path is PlanSpec/TextOpsSpec-asserted
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
      // unique dir per invocation: a fixed shared path would let two
      // concurrent drivers (Verify + Bench, parallel CI) overwrite each
      // other's index between the write and the query
      val idx = java.nio.file.Files
        .createTempDirectory("graft_q_ann_ivf_index").toString
      // the returned DataFrame is lazy (the caller counts/collects it later),
      // so the index can't be deleted here; a shutdown hook stops Verify +
      // Bench's warmup/reps from leaking one index copy per invocation
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        new scala.reflect.io.Directory(new java.io.File(idx)).deleteRecursively()))
      Similarity.writeIvfIndex(e, "vec_id", "embedding", idx, nCells = 8, kmeansIters = 1)
      Similarity.queryIvfIndex(e.filter(col("vec_id") < 30), "vec_id", "embedding",
        idx, k = 3, nProbe = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),
    "q_cosine_index" -> ((s, dir) => {
      // the PERSISTED text-cosine index end-to-end: write (frozen en-corpus
      // vocabulary, prefix postings, token-sorted vectors) then match a
      // derived query batch — exact en copies must hit 1.0, other-language
      // queries exercise the OOV ln(N) rule. The oracle recomputes the
      // frozen-weight brute force for EVERY (query, corpus) pair in DuckDB,
      // so a missed candidate or a drifted weight fails the gate
      val en = t(s, dir, "documents").filter(col("lang") === "en")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_q_cosine_index").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        new scala.reflect.io.Directory(new java.io.File(idx)).deleteRecursively()))
      Similarity.writeCosineIndex(en, "doc_id", "text", idx, threshold = 0.95)
      val q = t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      Similarity.queryCosineIndex(q, "doc_id", "text", idx)
        .orderBy("query_id", "corpus_id")
    }),
    "q_text_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 200)
      d.select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        TextStats.occurrences(concat(lit(" "), lower(col("text")), lit(" ")), " the ")
          .as("n_the"),
        round(TextStats.alphaRatio(col("text")), 6).as("alpha_ratio"),
        TextStats.fingerprintMd5(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),
    "q_lang_dist" -> ((s, dir) => {
      // spread before the langId projection: the stopword-counting
      // expression otherwise evaluates on the scan's single local partition
      // (map-side agg input); grouping/counts are unchanged
      Dedup.spreadIfNarrow(
          t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
          "doc_id")
        .select(col("lang"), TextStats.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    }),
    "q_quality" -> ((s, dir) => {
      // composite quality score (engine-specific formula -> rows-only);
      // components are oracle-checked via q_text_stats
      TextStats.documentStats(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_tokens", "n_bpe_tokens", "quality", "lang_pred")
        .orderBy("doc_id")
    }),
    "q_media_frames" -> ((s, dir) => {
      // multimodal plumbing: portable synthetic media (kind/duration from
      // doc_id arithmetic), frame sampling via posexplode
      val media = t(s, dir, "documents").select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(col("doc_id") * 37, lit(600000)) + 1).as("duration_ms"))
      Multimodal.sampleFrames(media, intervalMs = 60000L)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")
    }),
    "q_extract_text" -> ((s, dir) => {
      // per-row invariant (north star): text extracted from the html payload
      // is byte-identical to the stored text. Embed each document's escaped
      // text in a full page with script/style noise (including a FAKE
      // </body> inside the script), extract with TextExtract.fromHtml, and
      // report the md5 — the oracle is md5 of the ground-truth text itself,
      // so any extraction drift hash-mismatches.
      val page = concat(
        lit("<html><head><title>meta title</title><style>p{color:red}</style>"),
        lit("<script>var x = '<body>not text</body>';</script></head>"),
        lit("<body class=\"c\"><p>"), TextExtract.htmlEscape(col("text")),
        lit("</p></body></html>")).cast("binary")
      t(s, dir, "documents")
        .select(col("doc_id"), TextExtract.fromHtml(page).as("extracted"),
          col("text"))
        .select(col("doc_id"), md5(col("extracted")).as("extracted_md5"),
          (col("extracted") === col("text")).as("roundtrip"))
        .orderBy("doc_id")
    }),
    "q_url_canon" -> ((s, dir) => {
      // canonical-URL dedup key + SURT partition key (the first pass of web
      // dedup): synthesize a messy crawl URL from KNOWN components —
      // uppercase scheme/host, default ports, trailing host dot, scrambled +
      // tracking query params, fragment — then canonicalize. The oracle
      // asserts the known canonical form built from the same components; it
      // never re-implements the parser, so any canonicalization drift
      // hash-mismatches.
      val d = col("doc_id")
      val ds = d.cast("string")
      val messy = concat(
        when(pmod(d, lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
        lit("://WWW."), col("source"), lit(".Example.COM"),
        when(pmod(d, lit(5)) === 0, lit(".")).otherwise(lit("")),
        when(pmod(d, lit(3)) === 0,
          when(pmod(d, lit(2)) === 0, lit(":80")).otherwise(lit(":443")))
          .when(pmod(d, lit(7)) === 0, lit(":8080")).otherwise(lit("")),
        when(pmod(d, lit(11)) === 0, lit(""))
          .otherwise(concat(lit("/Docs/"), col("lang"), lit("/"), ds)),
        lit("?utm_source=feed&b=2&a=1&fbclid=XYZ#sec"), ds)
      t(s, dir, "documents")
        .select(d.as("doc_id"),
          UrlOps.canonicalUrl(messy).as("url_canon"),
          UrlOps.surtKey(messy).as("surt_key"))
        .orderBy("doc_id")
    }),
    "q_eval_sweep" -> ((s, dir) => {
      // pairwise precision/recall/F1 threshold sweep (the north rule's
      // acceptance metric as an operator): score the nation-blocked customer
      // pairs with the JW name similarity, label truth as segment equality —
      // both deterministic and DuckDB-expressible, so every count and metric
      // is oracle-checked end-to-end
      val pairs = customerPairs(s, dir)
        .select(col("id_a"), col("id_b"),
          round(GraftFunctions.jaroWinklerSim(col("name_a"), col("name_b")), 4)
            .as("score"),
          (col("seg_a") === col("seg_b")).as("truth"))
      // labels ride the scored table → the labeled variant: one pass over
      // the pair space, no second pair-join evaluation (measured 5.7 s →
      // one-join cost at sf0.1)
      Evaluation.thresholdSweepLabeled(pairs, "truth", Seq(0.7, 0.8, 0.9))
    }),
    "q_eval_bcubed" -> ((s, dir) => {
      // cluster-level quality metric (B-cubed): agreement between two real
      // partitions of the customer table — nation as the "predicted"
      // clustering, market segment as "truth". Fully deterministic, every
      // per-cell count and the final averages oracle-checked
      val c = t(s, dir, "customer")
      Evaluation.bcubed(
        c.select(col("c_custkey").as("node"), col("c_nationkey").as("cluster")),
        c.select(col("c_custkey").as("node"), col("c_mktsegment").as("cluster")))
    }),
    "q_quality_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality signals — zero-shuffle projection
      // (per-row bigram mode via sort-then-max-run, no corpus aggregate)
      QualityFilters.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    "q_compressibility" -> ((s, dir) => {
      // byte-level repetition via deflate compressibility (the MassiveText /
      // RefinedWeb "compression ratio" signal): zero-shuffle codegen
      // projection. Rows-only gate (DuckDB has no deflate); the value
      // semantics are pinned by QualityFiltersSpec's band/ordering
      // properties, and the repetitive tail surfaces deterministically by
      // appending each doc's own first 50 chars 20x for doc_id % 7 == 0
      val d = t(s, dir, "documents")
      val planted = when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), repeat(substring(col("text"), 1, 50), 20)))
        .otherwise(col("text"))
      d.select(col("doc_id"),
          round(QualityFilters.compressionRatio(planted), 4).as("deflate_ratio"),
          (pmod(col("doc_id"), lit(7)) === 0).as("planted_repetition"))
        .orderBy("doc_id")
    }),
    "q_pii_redact" -> ((s, dir) => {
      // PII detection + redaction: plant a deterministic email/IP/phone per
      // document (built from doc_id in BOTH engines), then count and redact.
      // The oracle runs the same RE2-safe patterns in DuckDB, so any regex
      // dialect drift (anchors, boundaries, greediness) hash-mismatches.
      val d = col("doc_id")
      val planted = concat(col("text"),
        lit(" contact user"), d.cast("string"), lit("@example.com"),
        lit(" from 10."), pmod(d, lit(256)).cast("string"), lit(".0.1"),
        lit(" call +1 555-01"),
        lpad(pmod(d, lit(100)).cast("string"), 2, "0"))
      val (ne, ni, np) = QualityFilters.piiCounts(planted)
      t(s, dir, "documents")
        .select(d.as("doc_id"),
          ne.cast("long").as("n_emails"), ni.cast("long").as("n_ips"),
          np.cast("long").as("n_phones"),
          md5(QualityFilters.redactPii(planted)).as("redacted_md5"))
        .orderBy("doc_id")
    }),
    "q_dedup_lines" -> ((s, dir) => {
      // corpus-level boilerplate line removal (RefinedWeb line dedup): wrap
      // every document in shared cookie/copyright lines, then drop every
      // line whose normalized form appears in >= 2 distinct documents and
      // reassemble in order. The injected boilerplate must vanish; bodies
      // of exact-duplicate docs vanish too (shared across >= 2 docs) — all
      // deterministic and adjudicated by the DuckDB twin.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("Cookie Notice: accept all cookies\n"), col("text"),
          lit("\nCopyright "), col("source"),
          lit(" all rights reserved")).as("text"))
      QualityFilters.dedupLines(docs, "doc_id", "text", minDupDocs = 2)
        .orderBy("doc_id")
    }),
    "q_corpus_filter" -> ((s, dir) => {
      // the corpus-curation pipeline end-to-end (CorpusPipeline.annotate):
      // wrap docs in shared boilerplate, plant exact duplicates (+10000 id
      // echoes of the first 40 docs), then adjudicate every document's
      // drop_reason. minQuality = 0 disables the one engine-specific rule
      // (composite quality score) so EVERY remaining rule — exact-dup
      // keeper, boilerplate vanish, length floor, repetition caps — is
      // recomputed independently by the DuckDB twin.
      val base = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("Cookie Notice: accept all cookies\n"), col("text"),
          lit("\nCopyright "), col("source"),
          lit(" all rights reserved")).as("text"))
      val dups = base.filter(col("doc_id") < 40)
        .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
      CorpusPipeline.annotate(base.union(dups), CorpusPipeline.Args(
        input = "", out = "", lineDupDocs = 5, minTokens = 10,
        maxDup5gram = 0.3, maxTopBigram = 0.2, minQuality = 0.0))
        .select(col("doc_id"),
          coalesce(col("drop_reason"), lit("kept")).as("drop_reason"))
        .orderBy("doc_id")
    }),
    "q_unigram_surprisal" -> ((s, dir) => {
      // model-based quality score (CCNet-style): mean unigram surprisal of
      // each document under the corpus's own token distribution — the
      // vocabulary is TextStats.tokenFrequencies (row-scale, broadcast)
      val docs = t(s, dir, "documents")
      val vocab = TextStats.tokenFrequencies(docs, "doc_id", "text")
      QualityFilters.unigramSurprisal(docs, "doc_id", "text", vocab)
        .orderBy("doc_id")
    }),
    "q_corpus_mix" -> ((s, dir) => {
      // deterministic data-mixture sampling: per-lang rates via the portable
      // md5 rule; zh = 1.0 exercises the keep-all fast path, missing strata
      // would be dropped by contract
      Sampling.weightedMix(t(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.9, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.125, "zh" -> 1.0))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),
    "q_span_dedup" -> ((s, dir) => {
      // substring-granular dedup (Lee et al. 2021): maximal merged spans of
      // 8-token windows occurring >= 2 times anywhere in the corpus
      SpanDedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
          k = 8, minCount = 2)
        .orderBy("doc_id", "span_start")
    }),
    "q_span_contamination" -> ((s, dir) => {
      // WHERE in each training page benchmark text appears — span-granular
      // decontamination; bench = copies of every 5th doc (q_contamination's
      // construction), target = the full corpus with original ids
      val d = t(s, dir, "documents")
      val bench = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      SpanDedup.contaminatedSpans(d, bench, "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    }),
    "q_span_removal" -> ((s, dir) => {
      // keep-one policy: the globally first occurrence (min (doc_id, pos))
      // of each duplicated window survives, all later ones are stripped
      SpanDedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
          k = 8, minCount = 2)
        .orderBy("doc_id")
    }),
    "q_contamination_bloom" -> ((s, dir) => {
      // Bloom-gated twin of q_contamination: same inputs, same output by
      // contract (shares q_contamination's oracle SQL — the hash match IS
      // the exact-equality proof), train-side shuffle cut by the codegen
      // bloom_might_contain pre-filter
      val d = t(s, dir, "documents")
      val bench = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.contaminationPairsBloom(bench, d, "doc_id", "text",
          shingleSize = 3, minShared = 5, maxShingleDf = 1000)
        .orderBy("bench_id", "train_id")
    }),
    "q_span_contamination_bloom" -> ((s, dir) => {
      // Bloom-gated twin of q_span_contamination (same oracle SQL): the
      // token-scale positional stream is pruned by the bloom filter before
      // the exact semi-join adjudicates survivors
      val d = t(s, dir, "documents")
      val bench = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      SpanDedup.contaminatedSpansBloom(d, bench, "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    }))

  /** The Bloom-gated operators are output-identical twins of their exact
    * forms (no false negatives; false positives die in the exact join), so
    * they share the exact form's oracle SQL verbatim — a hash-matched gate
    * row proving the identity, not just a rows-only sanity check.
    */
  def oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "q_contamination_bloom" -> oracleSqlBase("q_contamination"),
    "q_span_contamination_bloom" -> oracleSqlBase("q_span_contamination"))

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        | cast(sum(cast(l_quantity AS bigint)) AS bigint) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_topk_per_lang" ->
      """SELECT lang, source, rank, doc_id, n_chars FROM (
        | SELECT lang, source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang, source
        |                     ORDER BY n_chars DESC, doc_id ASC) AS rank
        | FROM documents) WHERE rank <= 3 ORDER BY lang, source, rank""".stripMargin,
    "q4_events_first" ->
      """SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_block_stats" ->
      """SELECT c_nationkey AS block_key, count(*) AS n,
        | cast(count(*) * (count(*) - 1) / 2 AS bigint) AS n_pairs
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gamma_exact" ->
      s"""SELECT ${gammaExactSql("a.c_mktsegment", "b.c_mktsegment")} AS gamma,
         | count(*) AS n $pairsSql GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gamma_numeric" ->
      s"""SELECT ${gammaNumSql("a.c_acctbal", "b.c_acctbal", 100, 500)} AS gamma,
         | count(*) AS n $pairsSql GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gamma_jw" ->
      s"""SELECT ${gammaJwSql("a.c_name", "b.c_name")} AS gamma,
         | count(*) AS n $pairsSql GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gamma_lv" ->
      s"""SELECT ${gammaEditSql("levenshtein", "a.c_name", "b.c_name")} AS gamma,
         | count(*) AS n $pairsSql GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gamma_dl" ->
      s"""SELECT ${gammaEditSql("damerau_levenshtein", "a.c_name", "b.c_name")} AS gamma,
         | count(*) AS n $pairsSql GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_patterns" ->
      s"""SELECT ${gammaJwSql("a.c_name", "b.c_name")} AS gamma_name,
         | ${gammaNumSql("a.c_acctbal", "b.c_acctbal", 100, 500)} AS gamma_bal,
         | ${gammaExactSql("a.c_mktsegment", "b.c_mktsegment")} AS gamma_seg,
         | count(*) AS counts $pairsSql GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_tf_table" ->
      """SELECT c_mktsegment,
        | round(greatest(count(*) / (SELECT count(*) FROM customer), 0.001), 6) AS tf
        |FROM customer WHERE c_mktsegment IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tf_adj" ->
      """WITH tf AS (
        |  SELECT c_mktsegment AS v,
        |   greatest(count(*) / (SELECT count(*) FROM customer), 0.001) AS tf
        |  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1)
        |SELECT round(coalesce(ta.tf, 1.0), 6) AS tf_seg_a,
        | round(coalesce(tb.tf, 1.0), 6) AS tf_seg_b,
        | round((coalesce(ta.tf, 1.0) + coalesce(tb.tf, 1.0)) / 2, 6) AS tf_denom,
        | count(*) AS n
        |FROM customer a JOIN customer b
        | ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |LEFT JOIN tf ta ON a.c_mktsegment = ta.v
        |LEFT JOIN tf tb ON b.c_mktsegment = tb.v
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_cluster_cc" ->
      """WITH RECURSIVE e AS (
        |  SELECT cast(c_custkey AS bigint) AS u,
        |         cast(c_nationkey AS bigint) + 1000000 AS v FROM customer),
        | und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        | walk(node, label) AS (
        |   SELECT u, u FROM und
        |   UNION
        |   SELECT und.v, walk.label FROM walk JOIN und ON walk.node = und.u)
        |SELECT node, min(label) AS component FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,
    // identical oracle to q_cluster_cc — the incremental fold must land on
    // exactly the from-scratch labeling of the full edge history
    "q_cluster_incr" ->
      """WITH RECURSIVE e AS (
        |  SELECT cast(c_custkey AS bigint) AS u,
        |         cast(c_nationkey AS bigint) + 1000000 AS v FROM customer),
        | und AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        | walk(node, label) AS (
        |   SELECT u, u FROM und
        |   UNION
        |   SELECT und.v, walk.label FROM walk JOIN und ON walk.node = und.u)
        |SELECT node, min(label) AS component FROM walk
        |GROUP BY node ORDER BY node""".stripMargin,
    "q_dedup_exact" -> {
      val norm = normSql("text")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0)
         |SELECT md5($norm) AS text_hash, count(*) AS n_docs,
         | min(doc_id) AS keeper_id
         |FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin
    },
    "q_dedup_canonical" -> {
      val norm = normSql("text")
      s"""WITH corpus AS (
         |  SELECT doc_id, text, (doc_id * 31) % 97 AS pref FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, ((doc_id + 1000000) * 31) % 97
         |  FROM documents WHERE doc_id % 5 = 0)
         |SELECT doc_id, first_value(doc_id) OVER (
         |  PARTITION BY md5($norm) ORDER BY pref DESC, doc_id ASC) AS canonical_id
         |FROM corpus ORDER BY doc_id""".stripMargin
    },
    "q_token_freq" -> {
      val norm = normSql("text")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS token FROM documents)
         |SELECT token, count(*) AS n_occurrences,
         | count(DISTINCT doc_id) AS n_docs
         |FROM toks WHERE token <> ''
         |GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""".stripMargin
    },
    "q_sample_split" ->
      """SELECT CASE WHEN substring(md5(cast(doc_id AS varchar)), 1, 2) < 'cc'
        | THEN 'train' ELSE 'val' END AS split, lang, count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_contamination" -> {
      // shingle twin of graft.functions.TextKernels.shingles: windows of 3
      // normalized tokens; a shorter doc yields ONE whole-array shingle;
      // empties dropped
      val norm = normSql("text")
      val toks = s"string_split($norm, ' ')"
      val shingles =
        s"""list_filter(list_transform(
           |   generate_series(1, greatest(len($toks) - 3, 0) + 1),
           |   i -> array_to_string($toks[i:least(i + 2, len($toks))], ' ')),
           |  x -> x <> '')""".stripMargin
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct($shingles)) AS s FROM documents),
         | hot AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1000),
         | tsh AS (SELECT doc_id AS train_id, s FROM sh
         |         WHERE s NOT IN (SELECT s FROM hot)),
         | bsh AS (SELECT doc_id + 1000000 AS bench_id, s FROM sh
         |         WHERE doc_id % 5 = 0)
         |SELECT bench_id, train_id, count(*) AS n_shared
         |FROM bsh JOIN tsh USING (s)
         |GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY 1, 2""".stripMargin
    },
    "q_dedup_jaccard" -> {
      def toks(c: String) = s"list_distinct(string_split(${normSql(c)}, ' '))"
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | round(
         |  CASE WHEN len(list_distinct(list_concat(${toks("a.text")}, ${toks("b.text")}))) = 0
         |   THEN 1.0
         |   ELSE len(list_intersect(${toks("a.text")}, ${toks("b.text")})) * 1.0
         |        / len(list_distinct(list_concat(${toks("a.text")}, ${toks("b.text")})))
         |  END, 6) AS jaccard
         |FROM documents a JOIN documents b
         | ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |WHERE round(
         |  CASE WHEN len(list_distinct(list_concat(${toks("a.text")}, ${toks("b.text")}))) = 0
         |   THEN 1.0
         |   ELSE len(list_intersect(${toks("a.text")}, ${toks("b.text")})) * 1.0
         |        / len(list_distinct(list_concat(${toks("a.text")}, ${toks("b.text")})))
         |  END, 6) >= 0.5
         |ORDER BY 1, 2""".stripMargin
    },
    "q_dedup_minhash" -> {
      // LSH candidate GENERATION is engine-specific (xxhash band keys), but
      // the emitted VALUES are not: the oracle re-reads the emitted pair set
      // (`__OUT_DIR__` is substituted with the run's output dir by
      // graft.Verify when it dumps oracle_sql.json) and recomputes each
      // pair's TRUE 3-token-shingle jaccard from the documents table — a
      // wrong jaccard, a below-threshold pair, or an id not in the corpus
      // all hash-mismatch. Candidate recall stays pinned by the
      // brute-force-recall unit test (TextOpsSpec).
      val norm = normSql("text")
      val toks = s"string_split($norm, ' ')"
      val shingles =
        s"""list_filter(list_transform(
           |   generate_series(1, greatest(len($toks) - 3, 0) + 1),
           |   i -> array_to_string($toks[i:least(i + 2, len($toks))], ' ')),
           |  x -> x <> '')""".stripMargin
      s"""WITH pairs AS (
         |  SELECT id_a, id_b FROM read_parquet('__OUT_DIR__/q_dedup_minhash.parquet')),
         | sh AS (SELECT doc_id, list_distinct($shingles) AS s FROM documents),
         | scored AS (
         |  SELECT p.id_a, p.id_b,
         |   CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 1.0
         |    ELSE len(list_intersect(a.s, b.s)) * 1.0
         |         / len(list_distinct(list_concat(a.s, b.s)))
         |   END AS j
         |  FROM pairs p JOIN sh a ON a.doc_id = p.id_a
         |               JOIN sh b ON b.doc_id = p.id_b)
         |SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored
         |WHERE j >= 0.3 ORDER BY 1, 2""".stripMargin
    },
    "q_dedup_simhash" -> {
      // The hamming VALUE is over engine-defined 64-bit signatures (xxhash
      // kernel — not reproducible in ANSI SQL; the kernel itself is pinned
      // bit-identical to two independent Spark implementations in
      // TextOpsSpec). What the oracle CAN adjudicate on the emitted rows:
      // pair ordering, the <= maxHamming contract, non-negative distances,
      // pair uniqueness (DISTINCT collapses any dupes into a row-count
      // mismatch), and that both ids exist in the corpus.
      s"""SELECT DISTINCT p.id_a, p.id_b, p.hamming
         |FROM read_parquet('__OUT_DIR__/q_dedup_simhash.parquet') p
         |JOIN documents a ON a.doc_id = p.id_a
         |JOIN documents b ON b.doc_id = p.id_b
         |WHERE p.id_a < p.id_b AND p.hamming BETWEEN 0 AND 10
         |ORDER BY 1, 2""".stripMargin
    },
    "q_cosine_join" -> {
      // brute-force twin of the prefix-filtered join: identical token,
      // weight (ln(N/df), df<N), and unit-norm definitions; every pair
      // sharing a weighted token is scored, so ANY candidate the engine's
      // prefix bound missed would appear here and fail the compare
      val toks = s"list_distinct(string_split(${normSql("text")}, ' '))"
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
         | nn AS (SELECT count(*)::DOUBLE AS n FROM d),
         | tok AS (SELECT doc_id, unnest($toks) AS t FROM d),
         | tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
         | dfq AS (SELECT t, count(*) AS df FROM tok2 GROUP BY t),
         | w AS (SELECT k.doc_id, k.t, ln(nn.n / d.df) AS idf
         |       FROM tok2 k JOIN dfq d USING (t), nn WHERE d.df < nn.n),
         | nrm AS (SELECT doc_id, sqrt(sum(idf * idf)) AS nm FROM w GROUP BY doc_id),
         | u AS (SELECT w.doc_id, w.t, w.idf / nrm.nm AS u
         |       FROM w JOIN nrm USING (doc_id)),
         | dots AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |   round(sum(a.u * b.u), 6) AS cosine
         |  FROM u a JOIN u b ON a.t = b.t AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, cosine FROM dots WHERE cosine >= 0.95
         |ORDER BY 1, 2""".stripMargin
    },
    "q_cosine_index" -> {
      // frozen-weight brute-force twin: en-corpus statistics, query batch
      // derived by the same doc_id % 3 rule, OOV tokens at ln(N), weight-0
      // (ubiquitous) tokens dropped on both sides — every qualifying
      // (query, corpus) pair recomputed from scratch
      val toks = s"list_distinct(string_split(${normSql("text")}, ' '))"
      s"""WITH c AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
         | q AS (SELECT doc_id + 2000000 AS doc_id, text FROM documents
         |       WHERE doc_id % 3 = 0),
         | nn AS (SELECT count(*)::DOUBLE AS n FROM c),
         | ctok AS (SELECT doc_id, t FROM
         |   (SELECT doc_id, unnest($toks) AS t FROM c) WHERE t <> ''),
         | vocab AS (SELECT t, ln(nn.n / count(*)) AS idf
         |           FROM ctok, nn GROUP BY t, nn.n),
         | cw AS (SELECT k.doc_id, k.t, v.idf FROM ctok k
         |        JOIN vocab v USING (t) WHERE v.idf > 0),
         | cn AS (SELECT doc_id, sqrt(sum(idf * idf)) AS nm FROM cw GROUP BY doc_id),
         | cu AS (SELECT cw.doc_id, cw.t, cw.idf / cn.nm AS u
         |        FROM cw JOIN cn USING (doc_id)),
         | qtok AS (SELECT doc_id, t FROM
         |   (SELECT doc_id, unnest($toks) AS t FROM q) WHERE t <> ''),
         | qw AS (SELECT k.doc_id, k.t, coalesce(v.idf, ln(nn.n)) AS idf
         |        FROM qtok k LEFT JOIN vocab v USING (t), nn),
         | qw1 AS (SELECT * FROM qw WHERE idf > 0),
         | qn AS (SELECT doc_id, sqrt(sum(idf * idf)) AS nm FROM qw1 GROUP BY doc_id),
         | qu AS (SELECT qw1.doc_id, qw1.t, qw1.idf / qn.nm AS u
         |        FROM qw1 JOIN qn USING (doc_id)),
         | dots AS (
         |  SELECT qu.doc_id AS query_id, cu.doc_id AS corpus_id,
         |   round(sum(qu.u * cu.u), 6) AS cosine
         |  FROM qu JOIN cu ON qu.t = cu.t GROUP BY 1, 2)
         |SELECT query_id, corpus_id, cosine FROM dots WHERE cosine >= 0.95
         |ORDER BY 1, 2""".stripMargin
    },
    "q_ann_topk" ->
      """SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(cast(q.embedding AS double[]),
        |                         cast(c.embedding AS double[])) AS cosine,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(cast(q.embedding AS double[]),
        |             cast(c.embedding AS double[])) DESC, c.vec_id ASC) AS rank
        | FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        | WHERE q.vec_id < 30)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_cosine_similarity(cast(a.embedding AS double[]),
        |                              cast(b.embedding AS double[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(cast(a.embedding AS double[]),
        |                             cast(b.embedding AS double[])) >= 0.4
        |ORDER BY 1, 2""".stripMargin,
    "q_ann_ivf" ->
      """SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(cast(q.embedding AS double[]),
        |                         cast(c.embedding AS double[])) AS cosine,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(cast(q.embedding AS double[]),
        |             cast(c.embedding AS double[])) DESC, c.vec_id ASC) AS rank
        | FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        | WHERE q.vec_id < 30)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q_ann_ivf_index" ->
      """SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_cosine_similarity(cast(q.embedding AS double[]),
        |                         cast(c.embedding AS double[])) AS cosine,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(cast(q.embedding AS double[]),
        |             cast(c.embedding AS double[])) DESC, c.vec_id ASC) AS rank
        | FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        | WHERE q.vec_id < 30)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q_text_stats" -> {
      val norm = normSql("text")
      val padded = "(' ' || lower(text) || ' ')"
      s"""SELECT doc_id,
         | CASE WHEN length(trim(text)) = 0 THEN 0
         |  ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END
         |  AS n_tokens,
         | cast((length($padded) - length(replace($padded, ' the ', ''))) / 5 AS int)
         |  AS n_the,
         | round(CASE WHEN length(text) = 0 THEN 0.0
         |  ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)
         |  END, 6) AS alpha_ratio,
         | substring(md5($norm), 1, 16) AS fingerprint
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
    },
    "q_lang_dist" ->
      s"""SELECT lang, ${langIdSql("text")} AS lang_pred, count(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_media_frames" ->
      """SELECT doc_id AS media_id,
        | cast(floor(((doc_id * 37) % 600000 + 1 - 1) / 60000) + 1 AS bigint) AS n_frames
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY 1""".stripMargin,
    // ground truth IS the stored text: extraction must invert the embedding
    // byte-for-byte, so the oracle never re-implements the extractor
    "q_extract_text" ->
      """SELECT doc_id, md5(text) AS extracted_md5, true AS roundtrip
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the expected canonical form rebuilt directly from the synthesis
    // components (never by re-parsing the messy URL): scheme/host lowered,
    // default ports and trailing dot gone, :8080 kept, empty path -> '/',
    // tracking params gone, surviving params sorted, fragment gone
    "q_url_canon" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END
        |   || '://www.' || lower(source) || '.example.com'
        |   || CASE WHEN doc_id % 3 <> 0 AND doc_id % 7 = 0 THEN ':8080' ELSE '' END
        |   || CASE WHEN doc_id % 11 = 0 THEN '/'
        |        ELSE '/Docs/' || lang || '/' || doc_id END
        |   || '?a=1&b=2' AS url_canon,
        | 'com,example,' || lower(source) || ',www)'
        |   || CASE WHEN doc_id % 11 = 0 THEN '/'
        |        ELSE '/Docs/' || lang || '/' || doc_id END
        |   || '?a=1&b=2' AS surt_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_eval_sweep" -> {
      val score = jwSql.format("a.c_name", "b.c_name")
      s"""WITH pairs AS (
         |  SELECT $score AS score,
         |    (a.c_mktsegment = b.c_mktsegment) AS truth
         |  $pairsSql
         |), grid AS (
         |  SELECT unnest([0.7::DOUBLE, 0.8::DOUBLE, 0.9::DOUBLE]) AS threshold),
         |counts AS (
         |  SELECT threshold,
         |    cast(sum(CASE WHEN truth AND score >= threshold THEN 1 ELSE 0 END) AS bigint) AS tp,
         |    cast(sum(CASE WHEN NOT truth AND score >= threshold THEN 1 ELSE 0 END) AS bigint) AS fp,
         |    cast(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS bigint) AS truth_n
         |  FROM pairs CROSS JOIN grid GROUP BY threshold)
         |SELECT threshold, tp, fp, truth_n - tp AS fn,
         |  CASE WHEN tp + fp = 0 THEN 0.0
         |    ELSE cast(tp AS double) / (tp + fp) END AS precision,
         |  CASE WHEN truth_n = 0 THEN 0.0
         |    ELSE cast(tp AS double) / truth_n END AS recall,
         |  CASE WHEN 2 * tp + fp + (truth_n - tp) = 0 THEN 0.0
         |    ELSE cast(2 * tp AS double) / (2 * tp + fp + (truth_n - tp)) END AS f1
         |FROM counts ORDER BY threshold""".stripMargin
    },
    "q_eval_bcubed" ->
      """WITH cells AS (
        |  SELECT c_nationkey AS c, c_mktsegment AS t,
        |    cast(count(*) AS bigint) AS n_ct
        |  FROM customer GROUP BY 1, 2),
        |nc AS (SELECT c, sum(n_ct) AS n_c FROM cells GROUP BY 1),
        |nt AS (SELECT t, sum(n_ct) AS n_t FROM cells GROUP BY 1),
        |sums AS (
        |  SELECT sum(cast(n_ct AS double) * n_ct / n_c) AS sum_p,
        |    sum(cast(n_ct AS double) * n_ct / n_t) AS sum_r,
        |    cast(sum(n_ct) AS bigint) AS n_nodes
        |  FROM cells JOIN nc USING (c) JOIN nt USING (t))
        |SELECT n_nodes,
        |  sum_p / n_nodes AS bcubed_precision,
        |  sum_r / n_nodes AS bcubed_recall,
        |  2.0 * (sum_p / n_nodes) * (sum_r / n_nodes)
        |    / ((sum_p / n_nodes) + (sum_r / n_nodes)) AS bcubed_f1
        |FROM sums""".stripMargin,
    "q_quality_repetition" -> {
      val norm = normSql("text")
      s"""WITH tk AS (
         |  SELECT doc_id, CASE WHEN length($norm) = 0 THEN []::VARCHAR[]
         |    ELSE string_split($norm, ' ') END AS toks
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, toks,
         |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i + 1]) END AS bi,
         |    CASE WHEN len(toks) < 5 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks) - 3),
         |             i -> array_to_string(list_slice(toks, i, i + 4), ' ')) END AS g5
         |  FROM tk),
         |top AS (
         |  SELECT doc_id, max(c) AS topn, sum(c) AS total FROM (
         |    SELECT doc_id, gram, count(*) AS c
         |    FROM (SELECT doc_id, unnest(bi) AS gram FROM g) GROUP BY 1, 2)
         |  GROUP BY 1)
         |SELECT g.doc_id,
         |  cast(len(toks) AS int) AS n_tokens,
         |  round(CASE WHEN len(toks) = 0 THEN 0.0
         |    ELSE 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) END, 6)
         |    AS dup_token_frac,
         |  round(CASE WHEN len(g5) = 0 THEN 0.0
         |    ELSE 1.0 - len(list_distinct(g5)) * 1.0 / len(g5) END, 6)
         |    AS dup_5gram_frac,
         |  round(coalesce(topn * 1.0 / total, 0.0), 6) AS top_bigram_frac
         |FROM g LEFT JOIN top ON g.doc_id = top.doc_id
         |ORDER BY g.doc_id""".stripMargin
    },
    "q_pii_redact" -> {
      val (e, i, p) =
        (QualityFilters.EmailRe, QualityFilters.Ipv4Re, QualityFilters.PhoneRe)
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text || ' contact user' || doc_id || '@example.com'
         |      || ' from 10.' || (doc_id % 256) || '.0.1'
         |      || ' call +1 555-01' || lpad(cast(doc_id % 100 AS varchar), 2, '0')
         |      AS t
         |  FROM documents),
         |s1 AS (SELECT doc_id, t,
         |  regexp_replace(t, '$e', ' ', 'g') AS no_email FROM planted),
         |s2 AS (SELECT *,
         |  regexp_replace(no_email, '$i', ' ', 'g') AS no_ip FROM s1)
         |SELECT doc_id,
         |  cast(len(regexp_extract_all(t, '$e')) AS bigint) AS n_emails,
         |  cast(len(regexp_extract_all(no_email, '$i')) AS bigint) AS n_ips,
         |  cast(len(regexp_extract_all(no_ip, '$p')) AS bigint) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(
         |    t, '$e', '<EMAIL>', 'g'), '$i', '<IP>', 'g'), '$p', '<PHONE>', 'g'))
         |    AS redacted_md5
         |FROM s2 ORDER BY doc_id""".stripMargin
    },
    "q_dedup_lines" -> {
      val normLn = normSql("ln")
      s"""WITH d2 AS (
         |  SELECT doc_id,
         |    'Cookie Notice: accept all cookies' || chr(10) || text || chr(10)
         |      || 'Copyright ' || source || ' all rights reserved' AS t
         |  FROM documents),
         |lines AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(t, chr(10)), 1) AS pos,
         |    unnest(string_split(t, chr(10))) AS ln
         |  FROM d2),
         |hot AS (
         |  SELECT md5($normLn) AS lh FROM lines
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         |kept AS (
         |  SELECT doc_id, pos, ln FROM lines
         |  WHERE md5($normLn) NOT IN (SELECT lh FROM hot))
         |SELECT d2.doc_id, coalesce(k.text_clean, '') AS text_clean
         |FROM d2 LEFT JOIN (
         |  SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text_clean
         |  FROM kept GROUP BY 1) k ON d2.doc_id = k.doc_id
         |ORDER BY d2.doc_id""".stripMargin
    },
    "q_corpus_filter" -> {
      val normT = normSql("t")
      val normLn = normSql("ln")
      val normTc = normSql("tc")
      s"""WITH d2 AS (
         |  SELECT doc_id,
         |    'Cookie Notice: accept all cookies' || chr(10) || text || chr(10)
         |      || 'Copyright ' || source || ' all rights reserved' AS t
         |  FROM documents),
         |alld AS (
         |  SELECT doc_id, t FROM d2
         |  UNION ALL SELECT doc_id + 10000, t FROM d2 WHERE doc_id < 40),
         |keep AS (SELECT md5($normT) AS h, min(doc_id) AS keeper
         |  FROM alld GROUP BY 1),
         |marked AS (SELECT a.doc_id, a.t, k.keeper
         |  FROM alld a JOIN keep k ON md5($normT) = k.h),
         |surv AS (SELECT doc_id, t FROM marked WHERE doc_id = keeper),
         |lines AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(t, chr(10)), 1) AS pos,
         |    unnest(string_split(t, chr(10))) AS ln
         |  FROM surv),
         |hot AS (SELECT md5($normLn) AS lh FROM lines
         |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5),
         |keptl AS (SELECT doc_id, pos, ln FROM lines
         |  WHERE md5($normLn) NOT IN (SELECT lh FROM hot)),
         |clean AS (
         |  SELECT s.doc_id, coalesce(x.tc, '') AS tc
         |  FROM surv s LEFT JOIN (
         |    SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS tc
         |    FROM keptl GROUP BY 1) x ON s.doc_id = x.doc_id),
         |tk AS (
         |  SELECT doc_id, tc, CASE WHEN length($normTc) = 0 THEN []::VARCHAR[]
         |    ELSE string_split($normTc, ' ') END AS toks
         |  FROM clean),
         |g AS (
         |  SELECT doc_id, tc, toks,
         |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i + 1]) END AS bi,
         |    CASE WHEN len(toks) < 5 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks) - 3),
         |             i -> array_to_string(list_slice(toks, i, i + 4), ' ')) END AS g5
         |  FROM tk),
         |top AS (
         |  SELECT doc_id, max(c) AS topn, sum(c) AS total FROM (
         |    SELECT doc_id, gram, count(*) AS c
         |    FROM (SELECT doc_id, unnest(bi) AS gram FROM g) GROUP BY 1, 2)
         |  GROUP BY 1),
         |rep AS (
         |  -- rounded to 6 like the engine's repetitionStats, so threshold
         |  -- comparisons cannot straddle the 7th decimal
         |  SELECT g.doc_id, tc, len(toks) AS n_tokens,
         |    round(CASE WHEN len(g5) = 0 THEN 0.0
         |      ELSE 1.0 - len(list_distinct(g5)) * 1.0 / len(g5) END, 6) AS dup5,
         |    round(coalesce(topn * 1.0 / total, 0.0), 6) AS topb
         |  FROM g LEFT JOIN top ON g.doc_id = top.doc_id)
         |SELECT m.doc_id,
         |  CASE WHEN m.doc_id <> m.keeper THEN 'exact_dup'
         |    WHEN length(r.tc) = 0 THEN 'all_boilerplate'
         |    WHEN r.n_tokens < 10 THEN 'too_short'
         |    WHEN r.dup5 > 0.3 THEN 'repetitive_5gram'
         |    WHEN r.topb > 0.2 THEN 'repetitive_bigram'
         |    ELSE 'kept' END AS drop_reason
         |FROM marked m LEFT JOIN rep r ON m.doc_id = r.doc_id
         |ORDER BY m.doc_id""".stripMargin
    },
    "q_unigram_surprisal" -> {
      val norm = normSql("text")
      s"""WITH tk AS (
         |  SELECT doc_id, unnest(CASE WHEN length($norm) = 0 THEN []::VARCHAR[]
         |    ELSE string_split($norm, ' ') END) AS token
         |  FROM documents),
         |vocab AS (SELECT token, count(*) AS n FROM tk GROUP BY 1),
         |tot AS (SELECT sum(n) AS total FROM vocab)
         |SELECT doc_id, cast(count(*) AS bigint) AS n_tokens,
         |  round(avg(-ln(n * 1.0 / total)), 6) AS mean_surprisal
         |FROM tk JOIN vocab USING (token) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_corpus_mix" -> {
      // threshold built by the SAME formula as Sampling.rateKeep so the twin
      // cannot drift from the engine
      def th(r: Double) = f"${math.floor(4294967296.0 * r).toLong}%08x"
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE CASE lang
         |  WHEN 'zh' THEN TRUE
         |  WHEN 'en' THEN substring(md5(cast(doc_id AS varchar)), 1, 8) < '${th(0.9)}'
         |  WHEN 'de' THEN substring(md5(cast(doc_id AS varchar)), 1, 8) < '${th(0.5)}'
         |  WHEN 'fr' THEN substring(md5(cast(doc_id AS varchar)), 1, 8) < '${th(0.25)}'
         |  WHEN 'es' THEN substring(md5(cast(doc_id AS varchar)), 1, 8) < '${th(0.125)}'
         |  ELSE FALSE END
         |ORDER BY doc_id""".stripMargin
    },
    "q_span_dedup" ->
      s"""WITH ${spanPosSql(8)},
         |dup AS (SELECT s FROM p GROUP BY s HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos FROM p WHERE s IN (SELECT s FROM dup)),
         |${spanMergeSql("hits", 8)}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start + 1 AS span_len
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_span_contamination" ->
      s"""WITH ${spanPosSql(8)},
         |bsh AS (SELECT DISTINCT s FROM p WHERE doc_id % 5 = 0),
         |hits AS (SELECT doc_id, pos FROM p WHERE s IN (SELECT s FROM bsh)),
         |${spanMergeSql("hits", 8)}
         |SELECT doc_id, span_start, span_end,
         |  span_end - span_start + 1 AS span_len
         |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_span_removal" ->
      s"""WITH ${spanPosSql(8)},
         |r AS (SELECT doc_id, pos,
         |   count(*) OVER (PARTITION BY s) AS n,
         |   row_number() OVER (PARTITION BY s ORDER BY doc_id, pos) AS rn
         |  FROM p),
         |rem AS (SELECT doc_id, pos FROM r WHERE n >= 2 AND rn > 1),
         |${spanMergeSql("rem", 8)},
         |cov AS (SELECT doc_id,
         |    unnest(generate_series(span_start, span_end)) AS cpos FROM spans),
         |tp AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
         |    i -> {'i': i - 1, 't': toks[i]})) AS u FROM docs),
         |tpos AS (SELECT doc_id, u.i AS i, u.t AS t FROM tp),
         |kept AS (SELECT tpos.doc_id, i, t FROM tpos
         |  ANTI JOIN cov ON tpos.doc_id = cov.doc_id AND tpos.i = cov.cpos),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |    string_agg(t, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, len(d.toks) AS n_tokens, coalesce(a.n_kept, 0) AS n_kept,
         |  len(d.toks) - coalesce(a.n_kept, 0) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM docs d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id""".stripMargin)
}
