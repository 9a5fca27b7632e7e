package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * The decode step is a clearly-marked deterministic STUB (no codec
  * libraries ship in this environment); everything Spark-side — schema,
  * partition batching, feature array shape, null handling — is real and
  * tested, so a real decoder drops in by replacing [[decodeStub]] only.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * A real implementation decodes the image/audio and extracts features;
    * the contract (fixed-length float array per row, null payload -> null
    * features) is what the pipeline depends on.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 33).toInt % 1000) / 1000.0f
      d += 1
    }
    out
  }

  /** Deterministic synthetic media table derived from the documents table
    * (payload = html-like bytes of the text) — the test/bench input.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(idCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(xxhash64(col(idCol), lit(3)), lit(600000)) + 1).cast("long").as("duration_ms"))

  /** Batched feature extraction: mapPartitions over (media_id, payload),
    * emitting (media_id, features array<float>). Batching shape mirrors a
    * vectorized-UDF pipeline: rows are processed in fixed-size batches so a
    * real decoder can amortize model/codec setup per batch; partitioning is
    * preserved (no shuffle).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup happens here in a real decoder
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            Row(id, decodeStub(payload, dim))
          }
        }
      }(enc)
  }

  /** Frame sampling stub for `video` rows: every row yields
    * ceil(duration_ms / intervalMs) frame descriptors, derived
    * deterministically — the explode-shaped plumbing of a real frame
    * sampler (schema + row multiplication), no codec.
    */
  def sampleFrames(media: DataFrame, intervalMs: Long = 10000L): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(sequence(lit(0L), floor((col("duration_ms") - 1) / intervalMs).cast("long")))
          .as(Seq("frame_idx", "frame_ts_ms")))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_ts_ms") * intervalMs).as("frame_ts_ms"))
}
