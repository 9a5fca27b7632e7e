package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword heuristic), quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen, pushdown-friendly).
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Count of non-overlapping occurrences of `needle` in `haystack` via the
    * length-difference trick (identical semantics in any SQL engine —
    * used for DuckDB-checkable oracles).
    */
  def occurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** Per-language stopword markers for the n-gram/stopword language-ID
    * heuristic. Space-padded so they match whole words mid-text.
    */
  val stopwordMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " in "),
    "de" -> Seq(" der ", " die ", " und ", " das ", " ist "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des "),
    "es" -> Seq(" el ", " la ", " que ", " los ", " una "))

  /** Stopword-count score for one language over a normalized text. */
  def langScore(text: Column, lang: String): Column =
    stopwordMarkers(lang).map(m => occurrences(text, m)).reduce(_ + _)

  /** Heuristic language ID: argmax of stopword scores; "und" (undetermined)
    * when every score is 0. Deterministic tie-break by language order
    * en > de > fr > es.
    */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    val langs = Seq("en", "de", "fr", "es")
    val scores = langs.map(l => langScore(t, l))
    val best = greatest(scores: _*)
    langs.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Ratio of alphabetic chars, punctuation chars, uppercase chars. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / length(text))

  /** Mean token length (0 for empty text). */
  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / n)
  }

  /** English stopword ratio — a standard quality signal. */
  def stopwordRatio(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(langScore(t, "en").cast("double") / n)
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * high alpha ratio, sane mean token length, low punct density.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val alpha = alphaRatio(text)
    val tokLen = meanTokenLength(text)
    val tokLenScore = when(tokLen >= 3 && tokLen <= 10, lit(1.0))
      .when(tokLen === 0, lit(0.0))
      .otherwise(lit(0.5))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore * 0.3 + alpha * 0.3 + tokLenScore * 0.2 + punct * 0.2), 6)
  }

  /** BPE-ish token-count estimate: words + digits + punctuation runs,
    * approximating subword tokenizer behavior without a vocab: each word
    * contributes ceil(len/4) tokens (avg subword ~4 chars).
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))

  /** 64-bit rolling-hash document fingerprint over normalized tokens:
    * polynomial hash fold (base 31, wraparound) — order-sensitive, stable
    * across runs. ANSI-safe: folds in try-mode arithmetic via pmod.
    */
  def fingerprint64(text: Column): Column =
    aggregate(
      split(Dedup.normalizeText(text), " "),
      lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(1000000007L)), lit(4611686018427387847L)))

  /** Hex md5 fingerprint of normalized text (first 16 hex chars) — the
    * SQL-portable fingerprint used by the oracle checks.
    */
  def fingerprintMd5(text: Column): Column =
    substring(md5(Dedup.normalizeText(text)), 1, 16)

  /** Corpus-level token frequency table over normalized tokens:
    * (token, n_occurrences, n_docs), tokens below `minCount` occurrences
    * dropped. One explode + one partial+final hash aggregate — the
    * vocabulary-building primitive of a text pipeline; at 100 TB the
    * map-side combine collapses each partition to its local vocabulary
    * before the shuffle.
    */
  def tokenFrequencies(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 1): DataFrame =
    docs
      .select(col(idCol).as("__id"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("__id")).as("n_docs"))
      .filter(col("n_occurrences") >= minCount)

  /** Full per-document stats projection. */
  def documentStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      tokenCount(t).as("n_tokens"),
      bpeTokenEstimate(t).as("n_bpe_tokens"),
      round(alphaRatio(t), 6).as("alpha_ratio"),
      round(punctRatio(t), 6).as("punct_ratio"),
      round(meanTokenLength(t), 6).as("mean_token_len"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      langId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      fingerprintMd5(t).as("fingerprint"))
  }
}
