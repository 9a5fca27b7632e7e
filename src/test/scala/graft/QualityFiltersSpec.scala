package graft

import org.apache.spark.sql.functions._
import graft.textops.QualityFilters

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) =
    Seq((1L, text)).toDF("doc_id", "text")

  // ---- repetition stats ----

  test("repetition stats on a crafted repetitive doc match hand counts") {
    // tokens: a b a b a b c  -> 7 tokens, 3 distinct
    val r = QualityFilters.repetitionStats(one("a b a b a b c"), "doc_id", "text")
      .head()
    assert(r.getAs[Int]("n_tokens") == 7)
    // dup_token_frac = 1 - 3/7
    assert(math.abs(r.getAs[Double]("dup_token_frac") - (1.0 - 3.0 / 7)) < 1e-6)
    // bigrams: ab ba ab ba ab bc -> 6 bigrams, mode "a b" x3
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 3.0 / 6) < 1e-6)
    // 5-grams: ababa babab ababc -> 3 distinct of 3 -> dup frac 0
    assert(r.getAs[Double]("dup_5gram_frac") == 0.0)
  }

  test("repetition stats edge cases: empty text, single token, all-same tokens") {
    val rEmpty = QualityFilters.repetitionStats(one("   "), "doc_id", "text").head()
    assert(rEmpty.getAs[Int]("n_tokens") == 0)
    assert(rEmpty.getAs[Double]("dup_token_frac") == 0.0)
    assert(rEmpty.getAs[Double]("top_bigram_frac") == 0.0)

    val rOne = QualityFilters.repetitionStats(one("word"), "doc_id", "text").head()
    assert(rOne.getAs[Int]("n_tokens") == 1)
    assert(rOne.getAs[Double]("top_bigram_frac") == 0.0)

    // x x x x: 4 tokens 1 distinct; 3 bigrams all "x x"; 0 5-grams
    val rSame = QualityFilters.repetitionStats(one("x x x x"), "doc_id", "text").head()
    assert(math.abs(rSame.getAs[Double]("dup_token_frac") - 0.75) < 1e-6)
    assert(rSame.getAs[Double]("top_bigram_frac") == 1.0)
    assert(rSame.getAs[Double]("dup_5gram_frac") == 0.0)
  }

  test("duplicate 5-gram fraction catches a repeated long phrase") {
    // the same 6-token sentence twice -> overlapping 5-grams repeat
    val txt = "the quick brown fox jumps high the quick brown fox jumps high"
    val r = QualityFilters.repetitionStats(one(txt), "doc_id", "text").head()
    assert(r.getAs[Double]("dup_5gram_frac") > 0.2)
  }

  // ---- PII ----

  test("PII counts and redaction on goldens") {
    val txt = "mail a.b+c@sub.example.org or root@h.io, ip 192.168.0.1, " +
      "call +1 555-123-4567 now"
    val d = one(txt)
    val (ne, ni, np) = QualityFilters.piiCounts(col("text"))
    val r = d.select(ne.as("e"), ni.as("i"), np.as("p"),
      QualityFilters.redactPii(col("text")).as("red")).head()
    assert(r.getAs[Int]("e") == 2)
    assert(r.getAs[Int]("i") == 1)
    assert(r.getAs[Int]("p") == 1)
    val red = r.getAs[String]("red")
    assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<PHONE>"))
    assert(!red.contains("example.org") && !red.contains("192.168.0.1"))
    // the phone match must not swallow the following space
    assert(red.contains("call <PHONE> now"))
  }

  test("PII redaction leaves clean text untouched") {
    val txt = "no pii here just words and the number 42"
    val r = one(txt).select(QualityFilters.redactPii(col("text")).as("red")).head()
    assert(r.getAs[String]("red") == txt)
  }

  // ---- line dedup ----

  test("dedupLines drops corpus-wide boilerplate, keeps unique bodies in order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nfirst unique body\nsecond line one\nFOOTER TEXT"),
      (2L, "COOKIE BANNER\nanother distinct body\nFOOTER TEXT"),
      (3L, "COOKIE BANNER\nthird body here\nFOOTER TEXT")).toDF("doc_id", "text")
    val out = QualityFilters.dedupLines(docs, "doc_id", "text", minDupDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq == Seq(
      "first unique body\nsecond line one",
      "another distinct body",
      "third body here"))
  }

  test("dedupLines returns empty string for an all-boilerplate doc and respects minDupDocs") {
    val docs = Seq(
      (1L, "SAME LINE\nSAME LINE"),
      (2L, "SAME LINE"),
      (3L, "only me")).toDF("doc_id", "text")
    // "SAME LINE" appears in 2 distinct docs -> dropped everywhere
    val out = QualityFilters.dedupLines(docs, "doc_id", "text", minDupDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq == Seq("", "", "only me"))
    // with minDupDocs = 3 nothing is dropped (2 distinct docs < 3; the
    // within-doc repeat does not count twice)
    val out3 = QualityFilters.dedupLines(docs, "doc_id", "text", minDupDocs = 3)
      .orderBy("doc_id").collect()
    assert(out3.map(_.getAs[String]("text_clean")).toSeq ==
      Seq("SAME LINE\nSAME LINE", "SAME LINE", "only me"))
  }

  test("dedupLines matches lines on NORMALIZED form (case/punct-insensitive)") {
    val docs = Seq(
      (1L, "Cookie Notice: ACCEPT!\nbody a"),
      (2L, "cookie notice accept\nbody b")).toDF("doc_id", "text")
    val out = QualityFilters.dedupLines(docs, "doc_id", "text", minDupDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq == Seq("body a", "body b"))
  }

  // ---- unigram surprisal ----

  test("unigram surprisal matches the hand-computed distribution") {
    // corpus: doc1 = "a a b", doc2 = "b c"; counts a=2 b=2 c=1, total 5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val vocab = graft.textops.TextStats.tokenFrequencies(docs, "doc_id", "text")
    val out = QualityFilters.unigramSurprisal(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
    val pA = 2.0 / 5; val pB = 2.0 / 5; val pC = 1.0 / 5
    val exp1 = -(math.log(pA) + math.log(pA) + math.log(pB)) / 3
    val exp2 = -(math.log(pB) + math.log(pC)) / 2
    assert(out(0).getAs[Long]("n_tokens") == 3)
    assert(math.abs(out(0).getAs[Double]("mean_surprisal") - exp1) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("mean_surprisal") - exp2) < 1e-5)
  }

  test("unigram surprisal falls back to count 1 for out-of-vocab tokens") {
    val docs = Seq((1L, "a zebra")).toDF("doc_id", "text")
    val vocab = Seq(("a", 9L, 1L)).toDF("token", "n_occurrences", "n_docs")
    val r = QualityFilters.unigramSurprisal(docs, "doc_id", "text", vocab).head()
    val exp = -(math.log(9.0 / 9) + math.log(1.0 / 9)) / 2
    assert(math.abs(r.getAs[Double]("mean_surprisal") - exp) < 1e-5)
  }

  // ---- deflate compressibility ----

  test("compression ratio: repetitive text compresses far below varied prose") {
    val prose = "science and history give readers many reasons to keep " +
      "learning about the wider world each day with fresh curiosity and joy"
    val spam = "buy now " * 40
    val rows = Seq((1L, prose), (2L, spam), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), QualityFilters.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(3L) == 1.0, "empty text must report 1.0 (no repetition evidence)")
    assert(rows(2L) < 0.2, s"looped phrase should compress hard, got ${rows(2L)}")
    assert(rows(1L) > rows(2L) + 0.2,
      s"prose (${rows(1L)}) must sit clearly above spam (${rows(2L)})")
    assert(rows(1L) > 0.3 && rows(1L) < 1.2,
      s"prose ratio ${rows(1L)} outside the natural-text band")
  }

  test("compression ratio is deterministic across invocations and row order") {
    val df = Seq((1L, "alpha beta gamma delta " * 3), (2L, "zz " * 50))
      .toDF("doc_id", "text")
    def vals(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), QualityFilters.compressionRatio(col("text")))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(vals(df) == vals(df.orderBy(desc("doc_id"))))
  }

  test("compression ratio decreases as repetition is appended") {
    val base = "the quick brown fox jumps over a lazy dog near the river bank"
    val grades = (0 to 3).map(k => (k.toLong, base + (" " + base) * (k * 4)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), QualityFilters.compressionRatio(col("text")).as("r"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(grades.sliding(2).forall { case Array(a, b) => b < a },
      s"ratio must fall monotonically with added repetition: ${grades.mkString(", ")}")
  }

  // ---- plan shape ----

  test("repetition stats plan is a pure projection: no exchange, no aggregate") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = QualityFilters.repetitionStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregate:\n$plan")
  }

  test("compression ratio plan is a pure projection (codegen, no exchange)") {
    // spark.range (not a local Seq): a literal LocalTableScan would be
    // constant-folded at plan time, hiding the expression from the plan
    val docs = spark.range(4)
      .select(concat(lit("a b c "), col("id").cast("string")).as("text"))
    val df = docs.select(QualityFilters.compressionRatio(col("text")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("deflate_ratio"), s"kernel missing from plan:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"must be a native expression, not a UDF:\n$plan")
  }
}
