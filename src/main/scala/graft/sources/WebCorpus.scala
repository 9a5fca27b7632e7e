package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Blocking

/** Deterministic synthetic Common-Crawl-style web-page corpus
  * (BASELINE.json `input_hint` schema:
  * url string, warc_ts timestamp, html binary, text string, lang string)
  * with planted duplicate clusters and a labeled-pair table.
  *
  * Everything is a pure column expression over `spark.range(n)` — seeded
  * xxhash64 drives every "random" choice, so the corpus is byte-identical
  * across runs and across parallelism levels (the per-row invariant:
  * byte-identical extracted text per url), and generation itself is fully
  * distributed (no driver loops, no collect).
  *
  * Cluster structure: base page i has cluster_id = i. A dup page re-emits a
  * deterministic base page under the same host+lang block with a mutated url
  * (tracking params / scheme / trailing slash) and a lightly perturbed text
  * (one token dropped + one token replaced) — bounded edit distance, like
  * real crawl near-duplicates.
  */
object WebCorpus {

  final case class Params(
      nBase: Long = 10000L,
      dupFraction: Double = 0.25,
      nHosts: Int = 200,
      seed: Long = 42L,
      minBodyTokens: Int = 20,
      maxBodyTokens: Int = 60,
      // opt-in open-vocabulary tail: ~10% of token positions carry a
      // near-unique per-(page, position) suffix, giving the corpus the
      // Zipfian rare-token tail real crawls have (the fixed 2,000-token
      // dictionary alone makes EVERY token common — min df grows linearly
      // with corpus size, the regime where rare-token techniques like
      // prefix filtering degenerate by construction). Default OFF: every
      // existing fixture, bench corpus, and gate hash is built on the
      // closed-dictionary text and must not shift.
      openVocab: Boolean = false)

  /** Deterministic token dictionary (pronounceable trigram combos). */
  private val dict: Array[String] = {
    val syll = Array("ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na",
      "pe", "qi", "ro", "su", "ta", "ve", "wa", "xe", "yo", "zu")
    (for (a <- syll; b <- syll; c <- Seq("n", "r", "s", "t", "l")) yield a + b + c)
  }

  private def h(seed: Long, cols: Column*): Column = xxhash64((lit(seed) +: cols): _*)

  /** pmod(hash) in [0, m) as long */
  private def hmod(seed: Long, m: Long, cols: Column*): Column = pmod(h(seed, cols: _*), lit(m))

  private val dictCol: Column = {
    // array literal of the dictionary; element_at is 1-based
    array(dict.map(lit): _*)
  }

  private val langs = Seq("en", "de", "fr", "es")

  /** Token array for base page id: title (3 tokens) ++ body (minBody..maxBody
    * tokens), every token chosen by a seeded hash of (page id, position).
    */
  private def baseTokens(p: Params, id: Column): Column = {
    val bodyLen = hmod(p.seed + 1, (p.maxBodyTokens - p.minBodyTokens + 1).toLong, id) +
      lit(p.minBodyTokens + 3) // +3 title tokens
    transform(sequence(lit(1), bodyLen), pos => {
      val base = element_at(dictCol,
        (hmod(p.seed + 2, dict.length.toLong, id, pos) + 1).cast("int"))
      if (!p.openVocab) base
      else
        // ~10% of positions: suffix the token with a hash of (page, pos) —
        // a near-hapax tail (alnum, so it survives normalization); dups
        // inherit the base page's rare tokens, exactly how real near-dup
        // pages share their distinguishing vocabulary
        when(hmod(p.seed + 11, 10L, id, pos) === 0,
          concat(base, lit("x"),
            hmod(p.seed + 12, 100000000L, id, pos).cast("string")))
          .otherwise(base)
    })
  }

  /** Builds the pages DataFrame. Output columns:
    * url, warc_ts, html, text, lang, cluster_id (ground truth), page_id.
    * Drop `cluster_id`/`page_id` for the engine-facing table.
    */
  def pages(spark: SparkSession, p: Params): DataFrame = {
    val nDups = (p.nBase * p.dupFraction).toLong

    val base = spark.range(p.nBase)
      .withColumn("base_id", col("id"))
      .withColumn("is_dup", lit(false))
      .withColumn("dup_idx", lit(0L))
    val dups = spark.range(nDups)
      .withColumn("base_id", hmod(p.seed + 3, p.nBase, col("id")))
      .withColumn("is_dup", lit(true))
      .withColumn("dup_idx", col("id") + 1)
    val all = base.unionByName(dups)

    val hostIdx = hmod(p.seed + 4, p.nHosts.toLong, col("base_id"))
    // Zipf-ish host skew: square the uniform draw so low host ids are hot
    val host = concat(lit("www.host"),
      ((hostIdx * hostIdx) / lit(p.nHosts.toLong)).cast("long").cast("string"),
      lit(".com"))
    val lang = element_at(
      array(langs.map(lit): _*),
      (hmod(p.seed + 5, langs.size.toLong, col("base_id")) + 1).cast("int"))

    val toks = baseTokens(p, col("base_id"))
    // dup perturbation: drop one token, replace another (positions + new
    // token all seeded by dup_idx) — bounded token-level edit distance
    val nToks = size(toks)
    // 0-based body positions in [3, nToks-1] — the 3 title tokens survive
    val dropPos = (hmod(p.seed + 6, 1000L, col("dup_idx")) % (nToks - lit(3)).cast("long")) + lit(3)
    val replPos = (hmod(p.seed + 7, 1000L, col("dup_idx")) % (nToks - lit(3)).cast("long")) + lit(3)
    val replTok = element_at(dictCol,
      (hmod(p.seed + 8, dict.length.toLong, col("dup_idx")) + 1).cast("int"))
    val mutated = filter(
      transform(toks, (t, i) => when(col("is_dup") && i === replPos, replTok).otherwise(t)),
      (_, i) => !(col("is_dup") && i === dropPos))

    val title = concat_ws(" ", slice(mutated, 1, 3))
    val text = concat_ws(" ", mutated)
    val pathTok = element_at(dictCol, (hmod(p.seed + 9, dict.length.toLong, col("base_id")) + 1).cast("int"))
    val urlVariant = hmod(p.seed + 10, 4L, col("dup_idx"))
    val baseUrl = concat(lit("https://"), host, lit("/"), pathTok, lit("/p"), col("base_id"))
    val url = when(!col("is_dup"), baseUrl)
      .when(urlVariant === 0, concat(baseUrl, lit("?utm_source=feed"), col("dup_idx")))
      .when(urlVariant === 1, concat(regexp_replace(baseUrl, "^https", "http"), lit("?ref="), col("dup_idx")))
      .when(urlVariant === 2, concat(baseUrl, lit("/"), lit("?s="), col("dup_idx")))
      .otherwise(concat(baseUrl, lit("?page=1&k="), col("dup_idx")))
    val warcTs = timestamp_seconds(lit(1577836800L) + col("base_id") * 60 + col("dup_idx"))
    val html = concat(lit("<html><title>"), title, lit("</title><body>"), text,
      lit("</body></html>")).cast("binary")

    all.select(
      url.as("url"),
      warcTs.as("warc_ts"),
      html.as("html"),
      text.as("text"),
      lang.as("lang"),
      col("base_id").as("cluster_id"),
      (col("base_id") * 1000000L + col("dup_idx")).as("page_id"))
  }

  /** Engine-facing table (exactly the input_hint schema). */
  def table(spark: SparkSession, p: Params): DataFrame =
    pages(spark, p).select("url", "warc_ts", "html", "text", "lang")

  /** The linkage-ready projection of [[pages]] shared by the flagship bench
    * and the spark-submit scaling runs: extracted comparison fields (title /
    * mid3 / tail3 token windows, first token, token count) plus the
    * deterministic host+lang blocking key. One narrow table per side is what
    * a production run would land after its extraction pass — comparators
    * never touch `html`/`text` again.
    */
  def linkInput(spark: SparkSession, p: Params): DataFrame =
    pages(spark, p)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("page_id"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("title"),
        concat_ws(" ", slice(col("toks"), 4, 3)).as("mid3"),
        concat_ws(" ", slice(col("toks"), 7, 3)).as("tail3"),
        element_at(col("toks"), 1).as("tok1"),
        col("lang"),
        size(col("toks")).as("n_tokens"),
        concat_ws("|", Blocking.host(col("url")), col("lang")).as("block"))

  /** All intra-block (host+lang) labeled pairs:
    * (id_a, id_b, url_a, url_b, is_dup). This is the F1 ground truth at the
    * fixed blocking key (BASELINE.md north rule).
    */
  def labeledPairs(spark: SparkSession, p: Params): DataFrame = {
    val pg = pages(spark, p)
      .withColumn("block", concat_ws("|", Blocking.host(col("url")), col("lang")))
    val a = pg.select(col("block"), col("page_id").as("id_a"),
      col("url").as("url_a"), col("cluster_id").as("c_a"))
    val b = pg.select(col("block"), col("page_id").as("id_b"),
      col("url").as("url_b"), col("cluster_id").as("c_b"))
    a.join(b, "block")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("url_a"), col("url_b"),
        (col("c_a") === col("c_b")).as("is_dup"))
  }
}
