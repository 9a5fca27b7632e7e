package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val goodBody =
    "science and history give the reader many good reasons to keep " +
      "learning about the world every single day with fresh curiosity"

  // planted corpus: shared boilerplate lines, one exact-dup pair, one
  // repetitive spam doc, one too-short doc, one PII doc
  private def corpus() = Seq(
    (1L, s"COOKIE BANNER\n$goodBody one\nFOOTER"),
    (2L, s"COOKIE BANNER\n$goodBody two\nFOOTER"),
    (3L, s"COOKIE BANNER\n$goodBody three\nFOOTER"),
    (4L, s"COOKIE BANNER\n$goodBody four\nFOOTER"),
    (5L, s"COOKIE BANNER\n$goodBody five\nFOOTER"),
    // exact dup of 1 (normalized: case-insensitive)
    (6L, s"cookie banner\n$goodBody ONE\nfooter"),
    // spam: a looping phrase — duplicate 5-grams dominate (checked first)
    (7L, "buy now " * 40 + "only today"),
    // too short after boilerplate removal
    (8L, "COOKIE BANNER\ntiny doc\nFOOTER"),
    // PII to redact, body long + varied enough to survive the filters
    (9L, s"COOKIE BANNER\nwrite to us at help@example.com or call " +
      s"+1 555-123-4567 about $goodBody\nFOOTER"),
    // a dominant bigram but NO repeated 5-gram (the bigram rule's own case)
    (10L, "x y x y x y a b c d e f"))
    .toDF("doc_id", "text")

  private val args = CorpusPipeline.Args(
    input = "unused", out = "unused",
    lineDupDocs = 5, minTokens = 10,
    maxDup5gram = 0.3, maxTopBigram = 0.2, minQuality = 0.2)

  test("annotate assigns the documented first-match drop reasons") {
    val ann = CorpusPipeline.annotate(corpus(), args)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ann(6L) == "exact_dup")
    assert(ann(7L) == "repetitive_5gram")
    assert(ann(8L) == "too_short")
    assert(ann(10L) == "repetitive_bigram")
    assert(ann(1L) == null && ann(9L) == null)
  }

  test("boilerplate lines vanish and PII is redacted in the kept text") {
    val out = CorpusPipeline.annotate(corpus(), args)
      .filter(col("drop_reason").isNull)
      .select("doc_id", "text_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out(1L).contains("COOKIE") && !out(1L).contains("FOOTER"))
    assert(out(9L).contains("<EMAIL>") && out(9L).contains("<PHONE>"))
    assert(!out(9L).contains("help@example.com"))
  }

  test("run writes the filtered parquet and a consistent JSON report") {
    val in = tmpDir("corpus_in") + "/docs.parquet"
    val out = tmpDir("corpus_out") + "/filtered.parquet"
    corpus().write.mode("overwrite").parquet(in)
    val report = CorpusPipeline.run(spark, args.copy(input = in, out = out))
    assert(report.contains("\"docs_in\":10"))
    assert(report.contains("\"exact_dup\":1"))
    assert(report.contains("\"too_short\":1"))
    assert(report.contains("\"repetitive_5gram\":1"))
    assert(report.contains("\"repetitive_bigram\":1"))
    val kept = spark.read.parquet(out)
    assert(kept.columns.toSet == Set("doc_id", "text", "n_tokens", "quality"))
    // docs_kept in the report equals rows written
    val keptN = kept.count()
    assert(report.contains(s""""docs_kept":$keptN"""))
    assert(keptN == 6)
    // --audit-out writes the full per-document decision record
    val audit = tmpDir("corpus_audit") + "/audit.parquet"
    CorpusPipeline.run(spark, args.copy(input = in, out = out, auditOut = audit))
    val a = spark.read.parquet(audit)
    assert(a.count() == 10, "audit table must cover EVERY input doc")
    val cols = a.columns.toSet
    assert(Set("doc_id", "drop_reason", "quality", "n_tokens",
      "dup_5gram_frac", "deflate_ratio").subsetOf(cols), cols.toString)
    assert(!cols.contains("text_out"), "redacted output text stays out of the audit")
  }

  test("duplicated-span coverage rule drops mostly-duplicate docs when enabled") {
    val rows = CorpusPipeline.annotate(corpus(), args.copy(maxDupSpanFrac = 0.5))
      .select("doc_id", "drop_reason", "dup_span_frac").collect()
    val reason = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    val frac = rows.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1-5 share the long body: each is now mostly duplicated spans
    assert(reason(1L) == "duplicated_spans" && frac(1L) > 0.5)
    assert(reason(2L) == "duplicated_spans")
    // first-match still wins for earlier rules
    assert(reason(6L) == "exact_dup")
    assert(reason(7L) == "repetitive_5gram")
    assert(reason(8L) == "too_short")
    // no duplicated 8-token window in doc 10 (bigram spam is shorter-range)
    assert(frac(10L) == 0.0)
    // default cap (1.0) disables the stage: the frac column is identically 0
    val off = CorpusPipeline.annotate(corpus(), args)
      .agg(max(col("dup_span_frac"))).collect()(0).getDouble(0)
    assert(off == 0.0)
  }

  test("deflate compressibility rule drops byte-repetitive docs when enabled") {
    // doc 11: 60 DISTINCT tokens (so no repeated 5-gram, no dominant
    // bigram, and the token-count floor passes) whose bytes are almost
    // entirely "ab" repeats — repetition invisible to the token-level
    // rules, caught by the byte-level deflate floor
    val withByteSpam = corpus().union(Seq(
      (11L, (0 until 60).map(i => "ab" * 15 + i).mkString(" ")))
      .toDF("doc_id", "text"))
    val on = CorpusPipeline.annotate(withByteSpam, args.copy(minDeflateRatio = 0.15))
      .select("doc_id", "drop_reason", "deflate_ratio").collect()
    val reason = on.map(r => r.getLong(0) -> r.getString(1)).toMap
    val ratio = on.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(reason(11L) == "repetitive_compress" && ratio(11L) < 0.15)
    // earlier rules still win first-match; clean docs survive
    assert(reason(7L) == "repetitive_5gram")
    assert(reason(1L) == null && ratio(1L) > 0.15)
    // default (0.0) disables the rule but the signal column still rides
    val off = CorpusPipeline.annotate(withByteSpam, args)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(off(11L) == null)
  }

  test("near-dup dedup stage: min-id doc per verified cluster keeps, rest drop") {
    // docs 21-23: one near-dup cluster (same long body, one token differs);
    // doc 24: similar-length but different content (must survive)
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val withNearDups = corpus().union(Seq(
      (21L, s"$body alpha"),
      (22L, s"$body beta"),
      (23L, s"$body gamma"),
      (24L, (100 to 140).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text"))
    val on = CorpusPipeline.annotate(withNearDups,
        args.copy(nearDupJaccard = 0.8))
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(on(21L) == null, "min-id member of the near-dup cluster must keep")
    assert(on(22L) == "near_dup" && on(23L) == "near_dup")
    assert(on(24L) == null, "dissimilar doc must not be swept into a cluster")
    // earlier rules still win first-match
    assert(on(6L) == "exact_dup")
    // off by default: the same corpus keeps all four
    val off = CorpusPipeline.annotate(withNearDups, args)
      .select("doc_id", "drop_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(off(22L) == null && off(23L) == null)
  }

  test("near-dup stage fails fast on a non-numeric id column") {
    // clustering casts ids to long; a string id would cast to null and the
    // stage would silently drop zero docs — the guard must throw instead
    val strIds = Seq(("a", "some text here"), ("b", "other text here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.annotate(strIds, args.copy(nearDupJaccard = 0.8))
    }
    assert(e.getMessage.contains("numeric id column"), e.getMessage)
    // off: string ids stay fine (no clustering involved)
    CorpusPipeline.annotate(strIds, args).count()
  }

  test("arg parser: defaults, overrides, and fail-fast on typos") {
    val a = CorpusPipeline.parseArgs(Seq(
      "--input", "i.parquet", "--out", "o.parquet",
      "--min-tokens", "5", "--no-redact-pii",
      "--max-dup-span-frac", "0.4", "--span-dedup-k", "6",
      "--min-deflate-ratio", "0.1"))
    assert(a.minTokens == 5 && !a.redactPii && a.idCol == "doc_id")
    assert(a.maxDupSpanFrac == 0.4 && a.spanK == 6)
    assert(a.minDeflateRatio == 0.1)
    intercept[IllegalArgumentException] {
      CorpusPipeline.parseArgs(Seq("--input", "i", "--out", "o", "--min-toknes", "5"))
    }
    intercept[IllegalArgumentException] {
      CorpusPipeline.parseArgs(Seq("--input", "i"))
    }
  }
}
