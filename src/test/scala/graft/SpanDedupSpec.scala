package graft

import org.apache.spark.sql.functions._
import graft.textops.SpanDedup

/** Substring-granular (duplicated-span) dedup: hand-built corpora with known
  * shared windows pin exact span boundaries, the keep-first removal policy,
  * intra-document counting, and adjacency (non-)merging; WebCorpus-scale
  * invariants guard the general shape. The DuckDB oracle (q_span_dedup /
  * q_span_contamination / q_span_removal) adjudicates full corpus values.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  // doc 1: carries the shared 8-gram at pos 0; globally first occurrence
  // doc 2: same 8-gram at pos 2 ("x y" prefix, "z" suffix)
  // doc 3: one 8-gram repeated twice back-to-back (intra-doc duplication;
  //        spans are ADJACENT, not overlapping, so they must NOT merge)
  // doc 4: too short for any window
  private lazy val docs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "x y a b c d e f g h z"),
    (3L, "p q r s t u v w p q r s t u v w"),
    (4L, "lone short doc")
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds exact cross-doc and intra-doc span boundaries") {
    val spans = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = K)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(spans == Seq(
      (1L, 0, 7, 8),   // "a b c d e f g h"
      (2L, 2, 9, 8),   // same window, shifted
      (3L, 0, 7, 8),   // first copy of the repeated block
      (3L, 8, 15, 8))) // second copy — adjacent, correctly NOT merged
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // two docs share a 9-token run -> two overlapping 8-windows each,
    // which must merge into a single 9-token span per doc
    val d = Seq(
      (1L, "m n o p q r s t u"),
      (2L, "zz m n o p q r s t u")).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(d, "doc_id", "text", k = K)
      .orderBy("doc_id").as[(Long, Int, Int, Int)].collect().toSeq
    assert(spans == Seq((1L, 0, 8, 9), (2L, 1, 9, 9)))
  }

  test("removeDuplicatedSpans keeps the globally first occurrence only") {
    val out = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = K)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 10, 10, 0, "a b c d e f g h i j"),      // first occurrence: intact
      (2L, 11, 3, 8, "x y z"),                     // later occurrence stripped
      (3L, 16, 8, 8, "p q r s t u v w"),           // intra-doc second copy gone
      (4L, 3, 3, 0, "lone short doc")))            // sub-window doc untouched
  }

  test("contaminatedSpans localizes corpus windows inside target docs") {
    val corpus = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val spans = SpanDedup.contaminatedSpans(docs, corpus, "doc_id", "text", k = K)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(spans.sorted == Seq((1L, 0, 7, 8), (2L, 2, 9, 8)))
  }

  test("window_hashes kernel is bit-identical to the interpreted HOF form") {
    val corpus = graft.sources.WebCorpus
      .pages(spark, graft.sources.WebCorpus.Params(nBase = 60, dupFraction = 0.3, nHosts = 5))
      .select(col("page_id").as("doc_id"),
        SpanDedup.normTokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= K)
    val kernel = graft.functions.GraftFunctions.windowHashes(col("toks"), K)
    val mismatches = corpus
      .select(kernel.as("a"), SpanDedup.hofWindowHashes(col("toks"), K).as("b"))
      .filter(col("a") =!= col("b"))
    assert(mismatches.count() == 0)
    // a sub-window doc yields an empty array (not a whole-array fallback)
    val short = Seq((1L, "just five little tokens here")).toDF("doc_id", "text")
      .select(SpanDedup.normTokens(col("text")).as("toks"))
      .select(graft.functions.GraftFunctions.windowHashes(col("toks"), K).as("h"))
    assert(short.select(size(col("h"))).collect()(0).getInt(0) == 0)
  }

  test("broadcast dup-hash path: value-identical, broadcast join in the plan") {
    val a = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = K)
    val b = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = K,
      broadcastDupHashes = true)
    assert(a.collect().toSet == b.collect().toSet)
    assert(b.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val ra = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = K)
    val rb = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = K,
      broadcastDupHashes = true)
    assert(ra.collect().toSet == rb.collect().toSet)
    val corpus = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val ca = SpanDedup.contaminatedSpans(docs, corpus, "doc_id", "text", k = K)
    val cb = SpanDedup.contaminatedSpans(docs, corpus, "doc_id", "text", k = K,
      broadcastCorpus = true)
    assert(ca.collect().toSet == cb.collect().toSet)
  }

  test("bloom-gated contaminatedSpans is value-identical; bloom filter in the plan") {
    val corpus = graft.sources.WebCorpus
      .pages(spark, graft.sources.WebCorpus.Params(nBase = 60, dupFraction = 0.3, nHosts = 5))
      .select(col("page_id").as("doc_id"), col("text"))
    val bench = corpus.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val exact = SpanDedup.contaminatedSpans(corpus, bench, "doc_id", "text", k = K)
    val bloomed = SpanDedup.contaminatedSpansBloom(corpus, bench, "doc_id", "text", k = K)
    assert(exact.collect().toSet == bloomed.collect().toSet)
    assert(exact.count() > 0)
    assert(bloomed.queryExecution.executedPlan.toString.contains("bloom_might_contain"))
  }

  test("span invariants hold on a WebCorpus-scale input") {
    val corpus = graft.sources.WebCorpus
      .pages(spark, graft.sources.WebCorpus.Params(nBase = 200, dupFraction = 0.4, nHosts = 8))
      .select(col("page_id").as("doc_id"), col("text"))
    val spans = SpanDedup.duplicatedSpans(corpus, "doc_id", "text", k = K).cache()
    assert(spans.count() > 0) // planted near-dups guarantee shared windows
    // every span: len == end - start + 1 >= K, inside the doc's token range
    val toks = corpus.select(col("doc_id"),
      size(SpanDedup.normTokens(col("text"))).as("nt"))
    val bad = spans.join(toks, "doc_id").filter(
      col("span_len") =!= col("span_end") - col("span_start") + 1 ||
        col("span_len") < K || col("span_start") < 0 || col("span_end") >= col("nt"))
    assert(bad.count() == 0)
    // spans never overlap within a doc (mergeSpans produced maximal islands)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val overl = spans.withColumn("prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end"))
    assert(overl.count() == 0)
    // removal bookkeeping is consistent with its own clean_text
    val rem = SpanDedup.removeDuplicatedSpans(corpus, "doc_id", "text", k = K)
    val inconsistent = rem.filter(
      col("n_tokens") - col("n_kept") =!= col("n_removed") ||
        size(SpanDedup.normTokens(col("clean_text"))) =!= col("n_kept"))
    assert(inconsistent.count() == 0)
    spans.unpersist()
  }
}
