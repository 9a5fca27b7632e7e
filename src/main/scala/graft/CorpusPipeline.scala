package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.textops.{Dedup, QualityFilters, SpanDedup, TextStats}

/** spark-submit entry point for the training-data curation pipeline over a
  * documents table: exact dedup → corpus-level boilerplate line removal →
  * repetition/quality filtering → PII redaction → filtered parquet, with a
  * machine-parseable one-line JSON report of why every dropped document was
  * dropped.
  *
  * {{{
  * spark-submit --master <cluster> --class graft.CorpusPipeline <classpath> \
  *   --input /data/documents.parquet --out /data/filtered.parquet \
  *   [--id doc_id] [--text text] \
  *   [--line-dup-docs 5]      boilerplate = line in >= N distinct docs \
  *   [--min-tokens 10] [--max-dup-5gram 0.3] [--max-top-bigram 0.2] \
  *   [--min-quality 0.25] [--no-redact-pii] \
  *   [--max-dup-span-frac 0.5]  drop docs whose duplicated-SPAN coverage \
  *   [--span-dedup-k 8]         (SpanDedup, corpus-wide k-token windows) \
  *                              exceeds the cap; 1.0 (default) = stage off \
  *   [--min-deflate-ratio 0.2]  drop docs whose deflate compressibility \
  *                              falls below the floor (byte-level
  *                              repetition); 0.0 (default) = rule off \
  *   [--near-dup-jaccard 0.85]  MinHash+LSH near-duplicate dedup over the
  *                              boilerplate-cleaned text (verified true
  *                              shingle Jaccard >= the cut; min-id doc per
  *                              connected near-dup cluster is kept);
  *                              0.0 (default) = stage off; requires
  *                              numeric ids (clustering contract) \
  *   [--audit-out /path]        also write the per-document audit table
  *                              (signal columns + drop_reason) as parquet
  * }}}
  *
  * Scale shape: ONE document-scale pass materializes every signal column
  * (normalized hash, cleaned text, repetition stats, quality) — the only
  * shuffles are the exact-dup keeper aggregate and the line-dedup
  * hot-line aggregate + reassembly, all row-scale with map-side combine;
  * no pair space exists anywhere. The drop accounting is one aggregate
  * over the annotated table (a `drop_reason` column, first matching rule
  * wins), not one count() action per stage — at 100 TB the difference is
  * one scan versus six.
  *
  * Filter defaults follow the published Gopher / RefinedWeb ranges (Rae et
  * al. 2021 table A1; Penedo et al. 2023 §4): repetition caps on duplicate
  * 5-grams and the top bigram share, a minimum length, and a composite
  * quality floor.
  */
object CorpusPipeline {

  final case class Args(
      input: String,
      out: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      lineDupDocs: Long = 5L,
      minTokens: Int = 10,
      maxDup5gram: Double = 0.3,
      maxTopBigram: Double = 0.2,
      minQuality: Double = 0.25,
      redactPii: Boolean = true,
      maxDupSpanFrac: Double = 1.0,
      spanK: Int = 8,
      minDeflateRatio: Double = 0.0,
      nearDupJaccard: Double = 0.0,
      auditOut: String = "")

  private val knownFlags = Set("input", "out", "id", "text", "line-dup-docs",
    "min-tokens", "max-dup-5gram", "max-top-bigram", "min-quality",
    "max-dup-span-frac", "span-dedup-k", "min-deflate-ratio",
    "near-dup-jaccard", "audit-out")

  def parseArgs(argv: Seq[String]): Args = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var redact = true
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--no-redact-pii" :: tail => redact = false; rest = tail
      case flag :: value :: tail if flag.startsWith("--") =>
        val k = flag.stripPrefix("--")
        // a misspelled flag must fail, not silently run with defaults
        if (!knownFlags(k)) throw new IllegalArgumentException(
          s"unknown flag --$k (known: ${(knownFlags + "no-redact-pii").toSeq.sorted.mkString(", ")})")
        m(k) = value; rest = tail
      case bad :: _ =>
        throw new IllegalArgumentException(s"unpaired argument: $bad")
    }
    def req(k: String) = m.getOrElse(k,
      throw new IllegalArgumentException(s"missing required --$k"))
    Args(
      input = req("input"),
      out = req("out"),
      idCol = m.getOrElse("id", "doc_id"),
      textCol = m.getOrElse("text", "text"),
      lineDupDocs = m.get("line-dup-docs").map(_.toLong).getOrElse(5L),
      minTokens = m.get("min-tokens").map(_.toInt).getOrElse(10),
      maxDup5gram = m.get("max-dup-5gram").map(_.toDouble).getOrElse(0.3),
      maxTopBigram = m.get("max-top-bigram").map(_.toDouble).getOrElse(0.2),
      minQuality = m.get("min-quality").map(_.toDouble).getOrElse(0.25),
      redactPii = redact,
      maxDupSpanFrac = m.get("max-dup-span-frac").map(_.toDouble).getOrElse(1.0),
      spanK = m.get("span-dedup-k").map(_.toInt).getOrElse(8),
      minDeflateRatio = m.get("min-deflate-ratio").map(_.toDouble).getOrElse(0.0),
      nearDupJaccard = m.get("near-dup-jaccard").map(_.toDouble).getOrElse(0.0),
      auditOut = m.getOrElse("audit-out", ""))
  }

  /** Annotates every input document with its signal columns and a
    * `drop_reason` (null = kept; first matching rule wins, in pipeline
    * order: exact_dup → all_boilerplate → near_dup → too_short →
    * repetitive_5gram → repetitive_bigram → duplicated_spans →
    * repetitive_compress → low_quality). Exposed separately so tests and
    * notebooks can audit the decision per document.
    */
  def annotate(docs: DataFrame, a: Args): DataFrame = {
    val id = col(a.idCol)
    // exact dedup: keeper = min id per normalized text, as ONE window over
    // the text hash (the aggregate + join-back form shuffled the text-
    // bearing rows by __h AND re-scanned the input for the keeper table;
    // the window shuffles the same rows once and both the survivor and
    // loser branches below re-read that one exchange — ReusedExchange)
    val keeperW = org.apache.spark.sql.expressions.Window.partitionBy("__h")
    val withKeeper = docs
      .withColumn("__h", md5(Dedup.normalizeText(col(a.textCol))))
      .withColumn("__keeper", min(id).over(keeperW))
    // boilerplate line removal runs on the WHOLE corpus (duplicate docs
    // must not be double-counted as line evidence — losers are dropped
    // first, then lines are counted over the survivors)
    val survivors = withKeeper.filter(id === col("__keeper"))
      .select(id, col(a.textCol))
    val cleaned = QualityFilters.dedupLines(
      survivors, a.idCol, a.textCol, minDupDocs = a.lineDupDocs)
    // repetition signals ride the cleaned rows as a projection — the old
    // repetitionStats(cleaned).join(cleaned) self-join re-evaluated the
    // whole line-dedup lineage once per join side
    val baseSignals = QualityFilters
      .withRepetitionStats(cleaned, "text_clean")
      .withColumn("quality", TextStats.qualityScore(col("text_clean")))
      // byte-level repetition (deflate compressibility): a pure codegen
      // projection riding the same pass — always annotated, gated by
      // minDeflateRatio only at the drop-rule stage
      .withColumn("deflate_ratio",
        round(QualityFilters.compressionRatio(col("text_clean")), 6))
    // duplicated-SPAN coverage (substring-granular, corpus-wide — SpanDedup):
    // the MassiveText-style "mostly duplicate content" rule. Off by default
    // and skipped entirely when off — the positional explode + hash shuffle
    // is the pipeline's one token-scale (vs row-scale) stage, so it must not
    // run for pipelines that didn't ask for it.
    val signals =
      if (a.maxDupSpanFrac >= 1.0)
        baseSignals.withColumn("dup_span_frac", lit(0.0))
      else {
        val spanTokens = SpanDedup
          .duplicatedSpans(cleaned, a.idCol, "text_clean", k = a.spanK)
          .withColumnRenamed("doc_id", a.idCol)
          .groupBy(a.idCol)
          .agg(sum(col("span_len")).as("__dup_span_tokens"))
        baseSignals.join(spanTokens, Seq(a.idCol), "left")
          .withColumn("dup_span_frac",
            round(coalesce(col("__dup_span_tokens"), lit(0L)).cast("double") /
              greatest(col("n_tokens"), lit(1)), 6))
          .drop("__dup_span_tokens")
      }
    // MinHash+LSH near-dup dedup over the boilerplate-CLEANED text (shared
    // boilerplate must not manufacture similarity): verified true-Jaccard
    // pairs -> connected components -> min-id doc per cluster keeps, the
    // rest drop as near_dup. Off by default and skipped entirely when off —
    // this is the pipeline's only stage with a (blocked, capped) pair space.
    val nearDupOf =
      if (a.nearDupJaccard <= 0.0) null
      else {
        // clustering casts ids to long; a string id would cast to null,
        // components would come back null, and the stage would silently
        // drop ZERO docs — fail fast instead (r5 ADVICE)
        docs.schema(a.idCol).dataType match {
          case _: org.apache.spark.sql.types.NumericType => ()
          case other => throw new IllegalArgumentException(
            s"--near-dup-jaccard requires a numeric id column (clustering " +
              s"casts ids to long); '${a.idCol}' is $other")
        }
        val pairs = Dedup.minhashDupPairs(
          cleaned, a.idCol, "text_clean", threshold = a.nearDupJaccard)
        graft.operators.ConnectedComponents.clusterPairs(pairs)
          .filter(col("node") =!= col("component"))
          .select(col("node").as(a.idCol), col("component").as("near_dup_of"))
      }
    val withNearDup =
      if (nearDupOf == null) signals.withColumn("near_dup_of", lit(null).cast("long"))
      else signals.join(nearDupOf, Seq(a.idCol), "left")
    val losers = withKeeper.filter(id =!= col("__keeper"))
      .select(id, col("__keeper").as("exact_dup_of"))
    val reason = when(col("exact_dup_of").isNotNull, "exact_dup")
      .when(length(col("text_clean")) === 0, "all_boilerplate")
      .when(col("near_dup_of").isNotNull, "near_dup")
      .when(col("n_tokens") < a.minTokens, "too_short")
      .when(col("dup_5gram_frac") > a.maxDup5gram, "repetitive_5gram")
      .when(col("top_bigram_frac") > a.maxTopBigram, "repetitive_bigram")
      .when(col("dup_span_frac") > a.maxDupSpanFrac, "duplicated_spans")
      .when(col("deflate_ratio") < a.minDeflateRatio, "repetitive_compress")
      .when(col("quality") < a.minQuality, "low_quality")
    // survivors and losers partition the id space (one row per input id, a
    // doc is either its group's keeper or not), so the old FULL OUTER join
    // on id — two doc-scale exchanges + sorts whose sides can never match —
    // is exactly a null-padded UNION of the two branches
    val survivorSide = withNearDup.withColumn("exact_dup_of",
      lit(null).cast(losers.schema("exact_dup_of").dataType))
    val loserSide = losers.select(survivorSide.schema.map { f =>
      f.name match {
        case n if n == a.idCol => id
        case "exact_dup_of"    => col("exact_dup_of")
        case other             => lit(null).cast(f.dataType).as(other)
      }
    }: _*)
    survivorSide.unionByName(loserSide)
      .withColumn("drop_reason", reason)
      .withColumn("text_out",
        when(col("drop_reason").isNotNull, lit(null).cast("string"))
          .otherwise(if (a.redactPii) QualityFilters.redactPii(col("text_clean"))
            else col("text_clean")))
  }

  /** Runs the pipeline; returns the JSON report line. Separated from `main`
    * so tests drive it with their own session.
    */
  def run(spark: SparkSession, a: Args): String = {
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(a.input)
    require(docs.columns.contains(a.idCol) && docs.columns.contains(a.textCol),
      s"input must carry columns '${a.idCol}' and '${a.textCol}': " +
        docs.columns.mkString(", "))
    val annotated = annotate(docs, a).persist()
    try {
      val kept = annotated.filter(col("drop_reason").isNull)
        .select(col(a.idCol), col("text_out").as(a.textCol),
          col("n_tokens"), col("quality"))
      kept.write.mode("overwrite").parquet(a.out)
      // the per-document audit table (every signal column + drop_reason):
      // the curation decision record reviewers and ablation studies read —
      // written from the SAME persisted annotation, so it costs one extra
      // write, never a recompute
      if (a.auditOut.nonEmpty)
        annotated.drop("text_out").write.mode("overwrite").parquet(a.auditOut)
      // ONE aggregate for the whole report (not a count() per stage)
      val byReason = annotated
        .groupBy(coalesce(col("drop_reason"), lit("kept")).as("reason"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = byReason.values.sum
      val reasons = Seq("exact_dup", "all_boilerplate", "near_dup",
        "too_short", "repetitive_5gram", "repetitive_bigram",
        "duplicated_spans", "repetitive_compress", "low_quality")
      val reasonJson = reasons
        .map(r => s""""$r":${byReason.getOrElse(r, 0L)}""").mkString("{", ",", "}")
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"docs_in":$total,"docs_kept":${byReason.getOrElse("kept", 0L)},""" +
        s""""dropped":$reasonJson,"redact_pii":${a.redactPii},""" +
        s""""out":"${a.out}","sec":${Fmt.num(sec, 2)}}"""
    } finally annotated.unpersist()
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv.toIndexedSeq)
    val spark = SparkSession.builder()
      .appName("graft-corpus-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, a))
  }
}
