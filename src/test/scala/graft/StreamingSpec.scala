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
}
