package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact-dedup emits only first-seen text, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingOps.firstSeenByText(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: "alpha" duplicated within the batch -> lowest id wins
      input.addData((3L, "alpha text"), (1L, "alpha text"), (2L, "beta text"))
      q.processAllAvailable()
      // batch 2: "alpha" again (cross-batch dup) + a new text
      input.addData((10L, "alpha text"), (11L, "gamma text"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((1L, "alpha text"), (2L, "beta text"), (11L, "gamma text")))
    } finally q.stop()
  }

  test("streaming near-dup: banded signature state flags cross-batch near-duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = base.replace("today", "tonight") // one token differs
    val unrelated = "completely different words about spark catalyst plans and shuffles here"
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingOps.nearDupStream(docs, "doc_id", "text",
        threshold = 0.4, shingleSize = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base), (2L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0) // nothing similar yet
      // near-dup of doc 1 arrives in a LATER micro-batch
      input.addData((3L, nearDup))
      q.processAllAvailable()
      val hits = spark.table("neardup_out").select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits == Set((1L, 3L)), s"got $hits")
      // exact duplicate (same text) of an already-seen doc also flags
      input.addData((4L, unrelated))
      q.processAllAvailable()
      val hits2 = spark.table("neardup_out").select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits2 == Set((1L, 3L), (2L, 4L)), s"got $hits2")
    } finally q.stop()
  }

  test("streaming near-dup: shingle-less docs never collide as spurious pairs") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingOps.nearDupStream(docs, "doc_id", "text",
        threshold = 0.4, shingleSize = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("neardup_empty_out")
      .outputMode(OutputMode.Append).start()
    try {
      // every doc is below the 3-token shingle size: the signature kernel's
      // sentinel all-MaxValue output would band-collide them pairwise as
      // est=1.0 "near-dups" without the size(shingles) > 0 cut (the batch
      // path applies the same filter)
      input.addData((1L, ""), (2L, "one two"), (3L, ""), (4L, "x"))
      q.processAllAvailable()
      assert(spark.table("neardup_empty_out").count() == 0)
    } finally q.stop()
  }

  test("streaming near-dup: bucket overflow is counted, not silent") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val acc = StreamingOps.bucketOverflowAcc(spark)
    val before = acc.value
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    // maxPerBucket = 1: the second identical doc is compared (hit emitted)
    // but NOT retained -> overflow counted once per shared bucket
    val q = StreamingOps.nearDupStream(docs, "doc_id", "text",
        threshold = 0.4, shingleSize = 3, numHashes = 16, bands = 4,
        maxPerBucket = 1, overflowAcc = Some(acc))
      .writeStream.format("memory").queryName("neardup_overflow")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, base))
      q.processAllAvailable()
      assert(acc.value == before) // first doc fills each bucket, no overflow
      input.addData((2L, base))
      q.processAllAvailable()
      val hits = spark.table("neardup_overflow").select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits == Set((1L, 2L)), s"got $hits") // still compared before overflow
      // doc 2 overflowed in each of its 4 band buckets
      assert(acc.value - before == 4, s"overflow = ${acc.value - before}")
      // doc 3 (same text) only sees doc 1 in state — doc 2 was never added
      input.addData((3L, base))
      q.processAllAvailable()
      val hits2 = spark.table("neardup_overflow").select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits2 == Set((1L, 2L), (1L, 3L)), s"got $hits2")
      assert(acc.value - before == 8, s"overflow = ${acc.value - before}")
    } finally q.stop()
  }

  test("streaming near-dup bridge: verifyPairs on stream candidates == batch minhashDupPairs") {
    // the stream emits signature-ESTIMATED Jaccard; the batch bridge joins
    // its candidate pairs back to the stored shingle sets and re-scores with
    // TRUE Jaccard — on the same corpus the result must equal the batch
    // path's (same verify stage, same threshold)
    import graft.textops.Dedup
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = base.replace("today", "tonight")
    val unrelated = "completely different words about spark catalyst plans and shuffles here"
    val corpus = Seq((1L, base), (2L, unrelated), (3L, nearDup), (4L, unrelated))
    val input = MemoryStream[(Long, String)]
    val q = StreamingOps.nearDupStream(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.4, shingleSize = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("neardup_bridge")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(corpus.take(2): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val candidates = spark.table("neardup_bridge").select("id_a", "id_b")
    assert(candidates.count() > 0)
    val stored = corpus.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9))).toSet
    val bridged = pairSet(Dedup.verifyPairs(stored, candidates, "doc_id", "text",
      threshold = 0.4, shingleSize = 3))
    val batch = pairSet(Dedup.minhashDupPairs(stored, "doc_id", "text",
      threshold = 0.4, shingleSize = 3))
    assert(bridged.nonEmpty && bridged == batch, s"bridged=$bridged batch=$batch")
  }

  test("streaming near-dup TTL: state function registers the timeout and evicts on it") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.{Optional => JOptional}
    val acc = spark.sparkContext.longAccumulator("test.overflow")
    val fn = StreamingOps.nearDupStateFn(0.5, 10, acc, ttlMs = Some(60000L))
    // arrival: state updated AND a 60 s processing-time timeout registered
    val st = TestGroupState.create[List[(Long, Seq[Long])]](
      optionalState = JOptional.empty[List[(Long, Seq[Long])]](), timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = JOptional.empty[Long](),
      hasTimedOut = false)
    val hits = fn(7L, Iterator(StreamingOps.BandedDoc(7L, 1L, Seq(1L, 2L))), st).toList
    assert(hits.isEmpty && st.exists)
    assert(st.getTimeoutTimestampMs.isPresent &&
      st.getTimeoutTimestampMs.get == 1000L + 60000L)
    // timeout firing: the bucket's state is removed (bounded state lifetime)
    val timedOut = TestGroupState.create[List[(Long, Seq[Long])]](
      optionalState = JOptional.of(List((1L, Seq(1L, 2L)))),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 120000L, eventTimeWatermarkMs = JOptional.empty[Long](),
      hasTimedOut = true)
    assert(fn(7L, Iterator.empty, timedOut).isEmpty)
    assert(timedOut.isRemoved)
    // post-eviction arrival of a twin is a MISS — the documented recall trade
    val fresh = TestGroupState.create[List[(Long, Seq[Long])]](
      optionalState = JOptional.empty[List[(Long, Seq[Long])]](), timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 121000L, eventTimeWatermarkMs = JOptional.empty[Long](),
      hasTimedOut = false)
    assert(fn(7L, Iterator(StreamingOps.BandedDoc(7L, 2L, Seq(1L, 2L))), fresh).isEmpty)
  }

  test("streaming incremental linkage: stream-static block join + batch EM weights") {
    import graft.config._
    import graft.operators.EmLink
    implicit val sqlCtx = spark.sqlContext
    // batch-estimated EM over a decisive pattern table: full agreement is a
    // match, anything else is not
    val em = EmLink.run(
      Seq(
        EmLink.Pattern(Array(2, 2), 50),
        EmLink.Pattern(Array(2, 0), 100),
        EmLink.Pattern(Array(0, 2), 100),
        EmLink.Pattern(Array(0, 0), 10000)),
      (200L, 200L), Seq("name", "num"))
    assert(em.patterns.find(p => p.gammas.sameElements(Array(2, 2))).get.zeta > 0.9)
    val cfg = MatchConfig(
      idA = "sid", idB = "cid",
      comparisons = ComparisonGroup("s", Seq(
        VariableSpec("name", "jarowinkler", cutA = 0.92, cutB = 0.88),
        VariableSpec("num", "numeric", cutA = 1, cutB = 2))))
    val static = Seq(
      (100L, "JOHNATHAN SMITH", 42.0, "b1"),
      (101L, "MARIA GARCIA", 7.0, "b1"),
      (102L, "WEI CHEN", 13.0, "b2")).toDF("cid", "name", "num", "block")
    val input = MemoryStream[(Long, String, Double, String)]
    val stream = input.toDF().toDF("sid", "name", "num", "block")
    val out = StreamingOps.linkStream(stream, static, cfg, em, Seq("block"))
    val q = out.writeStream.format("memory").queryName("linked")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, "JONATHAN SMITH", 42.0, "b1"),  // jw(JOHNATHAN,JONATHAN..)>=0.92, num equal -> match
        (2L, "ZZZZ YYYY", 99.0, "b1"),       // no agreement -> filtered
        (3L, "WEI CHEN", 13.5, "b2"))        // exact-ish in other block -> match
      q.processAllAvailable()
      val rows = spark.table("linked").select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 100L), (3L, 102L)), s"got $rows")
      // second micro-batch keeps working (stateless join)
      input.addData((4L, "MARIA GARCIA", 7.0, "b1"))
      q.processAllAvailable()
      assert(spark.table("linked").count() == 3)
    } finally q.stop()
  }

  test("watermarked windowed lang counts aggregate and finalize on watermark advance") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDF().toDF("ts", "lang")
    val q = StreamingOps.windowedLangCounts(docs, "ts", "lang",
        windowDuration = "1 minute", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("lang_out")
      .outputMode(OutputMode.Append).start()
    def ts(s: String) = Timestamp.valueOf(s)
    try {
      input.addData(
        (ts("2026-01-01 00:00:10"), "en"),
        (ts("2026-01-01 00:00:40"), "en"),
        (ts("2026-01-01 00:00:50"), "de"))
      q.processAllAvailable()
      // advance event time far enough to close the first window
      input.addData((ts("2026-01-01 00:05:00"), "en"))
      q.processAllAvailable()
      input.addData((ts("2026-01-01 00:10:00"), "en"))
      q.processAllAvailable()
      val out = spark.table("lang_out")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("lang"), col("n_docs"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(out.contains(("00:00", "en", 2L)), s"got $out")
      assert(out.contains(("00:00", "de", 1L)), s"got $out")
    } finally q.stop()
  }

  test("streaming cosine match == batch queryCosineIndex; no duplicate pair rows; OOV matches nothing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.textops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("coscidx_stream").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    val corpus = graft.sources.WebCorpus
      .pages(spark, graft.sources.WebCorpus.Params(nBase = 60, dupFraction = 0.3, nHosts = 5))
      .select(col("page_id").as("doc_id"), col("text"))
    Similarity.writeCosineIndex(corpus, "doc_id", "text", path, threshold = 0.6)

    // queries: near-copies of corpus docs (must hit), one all-OOV, one empty
    val queryRows = corpus.limit(8)
      .select((col("doc_id") + 9300000000L).as("doc_id"),
        concat(col("text"), lit(" zq"), col("doc_id").cast("string")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++
      Seq((9911111111L, "xxq wwq eeq rrq ttq"), (9922222222L, ""))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingOps.cosineMatchStream(docs, "doc_id", "text", path)
      .writeStream.format("memory").queryName("cos_out")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = queryRows.splitAt(4) // two micro-batches
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val rows = spark.table("cos_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // the min-shared-prefix-token dedup must emit each pair EXACTLY once
      assert(rows.length == rows.toSet.size, "duplicate pair rows emitted")
      val got = rows.toSet
      val exp = Similarity.queryCosineIndex(
          queryRows.toDF("doc_id", "text"), "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == exp, s"missing=${exp -- got}, extra=${got -- exp}")
      assert(got.nonEmpty && got.exists(_._3 > 0.9))
      assert(!got.exists(p => p._1 == 9911111111L || p._1 == 9922222222L))
    } finally q.stop()
  }
}
