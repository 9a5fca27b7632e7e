package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality filtering operators for LLM training-data pipelines:
  * Gopher-style repetition signals, PII redaction, corpus-level boilerplate
  * line removal (RefinedWeb-style), and a unigram-LM surprisal score (the
  * "model-based quality filter" of a CCNet-style pipeline, with the model
  * being the corpus's own unigram distribution).
  *
  * Scale shapes:
  *   - repetition stats: ONE projection, zero shuffle — every signal
  *     (duplicate-token fraction, duplicate-5-gram fraction, top-bigram
  *     fraction) is computed per row from token arrays materialized once;
  *     the per-row bigram mode uses sort-then-max-run instead of an
  *     explode + corpus-wide aggregate, so no pair- or token-scale shuffle
  *     exists at all.
  *   - PII redaction: pure regexp projections (codegen, pushdown-friendly).
  *   - line dedup: row-scale explode + ONE hash agg on the line hash
  *     (map-side combine) + anti-join + per-doc reassembly — the same
  *     shape as exact dedup, one granularity down.
  *   - unigram surprisal: token explode + join against the vocabulary
  *     (broadcast when small) + per-doc agg; the vocabulary is the
  *     already-distributed TextStats.tokenFrequencies output.
  */
object QualityFilters {

  /** Deflate compressibility of the raw text (compressed/raw UTF-8 bytes at
    * zlib level 6) — the byte-level repetition signal quality pipelines use
    * alongside token n-gram fractions: templated or repetitive pages
    * compress far below natural prose (~0.4–0.7), so a LOW ratio marks
    * repetition. Pure codegen projection
    * ([[graft.functions.GraftFunctions.deflateRatio]]); empty text → 1.0.
    */
  def compressionRatio(text: Column): Column =
    graft.functions.GraftFunctions.deflateRatio(text)

  /** Normalized token array; empty text yields an EMPTY array (split would
    * yield `[""]`).
    */
  def tokenArray(text: Column): Column = {
    val n = Dedup.normalizeText(text)
    when(length(n) === 0, array().cast("array<string>")).otherwise(split(n, " "))
  }

  /** Word n-grams over an already-materialized token array (space-joined);
    * fewer than n tokens yields an empty array. The array is built once per
    * row — never re-derived downstream (see Dedup's performance invariant).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Longest run of equal adjacent values in the SORTED array = the count of
    * the most frequent element (the mode count), without any shuffle.
    */
  private def modeCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  private def dupFrac(arr: Column): Column =
    when(size(arr) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(arr)).cast("double") / size(arr))

  /** Gopher-style per-document repetition signals (Rae et al. 2021, table
    * A1, adapted to token streams): duplicate-token fraction,
    * duplicate-5-gram fraction, and the fraction of bigrams taken by the
    * single most frequent bigram. High values on any of them mark
    * low-quality repetitive text (keyword stuffing, boilerplate loops).
    * Output: (id, n_tokens, dup_token_frac, dup_5gram_frac,
    * top_bigram_frac) — one projection, zero shuffle.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withRepetitionStats(docs.select(col(idCol), col(textCol)), textCol)
      .drop(textCol)

  /** [[repetitionStats]] as APPENDED columns on the input rows — the shape a
    * pipeline wants: computing the stats in place keeps the annotate pass a
    * single projection instead of a doc-scale self-join of the cleaned
    * table with its own stats (the join form re-evaluated the whole
    * upstream line-dedup lineage once per side).
    */
  def withRepetitionStats(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__toks", tokenArray(col(textCol)))
      .withColumn("__bi", ngrams(col("__toks"), 2))
      .withColumn("__g5", ngrams(col("__toks"), 5))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("dup_token_frac", round(dupFrac(col("__toks")), 6))
      .withColumn("dup_5gram_frac", round(dupFrac(col("__g5")), 6))
      .withColumn("top_bigram_frac", round(
        when(size(col("__bi")) === 0, lit(0.0))
          .otherwise(modeCount(col("__bi")).cast("double") / size(col("__bi"))),
        6))
      .drop("__toks", "__bi", "__g5")

  /** PII patterns — deliberately conservative, RE2-compatible (no
    * backreferences/lookaround) so any engine's regexp runs them
    * identically. Order matters: emails first (their dotted domains would
    * otherwise half-match the IP pattern's neighborhood), then IPs, then
    * phones (whose separators keep them disjoint from dotted quads).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  // the optional 4th group requires its separator AND a digit together —
  // a bare trailing `[ -]?` would swallow the space after the phone number
  // and glue the redaction placeholder to the next word
  val PhoneRe = "\\+?[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3,4}(?:[ -][0-9]{1,4})?\\b"

  /** Count of PII hits per kind. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val noEmail = regexp_replace(text, EmailRe, " ")
    val noIp = regexp_replace(noEmail, Ipv4Re, " ")
    (regexp_count(text, lit(EmailRe)),
      regexp_count(noEmail, lit(Ipv4Re)),
      regexp_count(noIp, lit(PhoneRe)))
  }

  /** Redact PII in place with typed placeholders (`<EMAIL>`, `<IP>`,
    * `<PHONE>`), applied in the documented order. Pure projection.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Corpus-level boilerplate line removal (the RefinedWeb / CCNet line
    * dedup stage): drop every line whose NORMALIZED form appears in at
    * least `minDupDocs` distinct documents, then reassemble each document
    * with line order preserved. Documents whose every line was boilerplate
    * come back with an empty string (never dropped — downstream length
    * filters decide).
    *
    * Shape at 100 TB: lines are row-scale (explode), the hot-line table is
    * ONE hash aggregate with map-side combine, removal is an anti-join on
    * the line hash, reassembly one per-doc aggregate. No pair space exists.
    */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDupDocs: Long = 2): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__lh", md5(Dedup.normalizeText(col("__line"))))
    val hot = lines
      .groupBy("__lh")
      .agg(countDistinct(col("__id")).as("__n"))
      .filter(col("__n") >= minDupDocs)
      .select("__lh")
    val kept = lines
      .join(hot, Seq("__lh"), "left_anti")
      .groupBy("__id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")),
        "\n").as("text_clean"))
    docs
      .select(col(idCol))
      .join(kept.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Unigram-LM surprisal per document: mean negative log-probability of
    * its tokens under the corpus's own unigram distribution (the vocabulary
    * from [[TextStats.tokenFrequencies]]). Low = stereotypical text, high =
    * rare-token soup; both tails are what a CCNet-style quality filter
    * trims. No smoothing is needed when the vocabulary was built over the
    * same corpus (every token is in-vocab); tokens absent from the supplied
    * vocabulary fall back to a count of 1 (add-one on the unseen mass).
    *
    * The vocabulary side is row-scale (distinct tokens); the join strategy
    * is left to AQE — small vocabularies broadcast at runtime, but a
    * 100 TB corpus's billion-token vocabulary must be allowed to
    * shuffle-join (a forced broadcast hint would OOM the executors). The
    * total-token normalizer rides a 1-row broadcast cross join, not a
    * driver collect.
    */
  def unigramSurprisal(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    val total = vocab.agg(sum(col("n_occurrences")).as("__total"))
    val toks = Dedup
      .spreadIfNarrow(docs.select(col(idCol).as("__id"), col(textCol)), "__id")
      .select(col("__id"), explode(tokenArray(col(textCol))).as("token"))
    toks
      .join(vocab.select(col("token"), col("n_occurrences")),
        Seq("token"), "left")
      .join(broadcast(total))
      .select(col("__id"),
        (-log(coalesce(col("n_occurrences"), lit(1L)).cast("double") /
          col("__total"))).as("__nll"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__nll")), 6).as("mean_surprisal"))
      .withColumnRenamed("__id", idCol)
  }
}
