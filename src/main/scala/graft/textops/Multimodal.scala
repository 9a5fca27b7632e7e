package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched feature extraction over partitions.
  *
  * Images decode for real via pure-JDK `javax.imageio` (PNG/JPEG/BMP/GIF —
  * [[decodeImage]]); audio decodes for real via pure-JDK
  * `javax.sound.sampled` (WAV/AIFF/AU PCM — [[decodeAudio]]); video decodes
  * for real for animated-GIF payloads (ImageIO reads every frame —
  * [[decodeVideo]]: frame count + per-frame luminance envelope). True video
  * CODEC formats (mp4/webm/...) have no decoder in this environment and fall
  * back to the clearly-marked deterministic [[decodeStub]]; the Spark-side
  * contract — schema, partition batching, feature array shape, null
  * handling — is identical everywhere, so a codec library drops in by
  * replacing that one function.
  */
object Multimodal {

  /** Real audio decode (WAV/AIFF/AU via `javax.sound.sampled`):
    * [0]=sample rate Hz, [1]=duration ms, [2]=channels, [3]=overall RMS in
    * [0,1], [4]=peak amplitude in [0,1], [5..dim-1]=per-segment RMS over
    * `dim - 5` equal time segments (a coarse energy envelope). Samples are
    * read on a bounded budget (~64k frames on a stride) so cost is capped
    * regardless of clip length. Returns null for null or undecodable
    * payloads (corrupt audio semantics). Non-PCM encodings are converted to
    * PCM_SIGNED first when the JDK can.
    */
  def decodeAudio(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || dim < 6) return null
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais0 =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: Throwable => return null }
    try {
      val src = ais0.getFormat
      val ais =
        if (src.getEncoding == AudioFormat.Encoding.PCM_SIGNED && src.getSampleSizeInBits == 16) ais0
        else try {
          val tgt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, src.getSampleRate,
            16, src.getChannels, 2 * src.getChannels, src.getSampleRate, false)
          AudioSystem.getAudioInputStream(tgt, ais0)
        } catch { case _: Throwable => return null }
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val frameBytes = fmt.getFrameSize
      val totalFrames = ais.getFrameLength
      if (totalFrames <= 0 || frameBytes <= 0) return null
      val durationMs = totalFrames * 1000.0 / fmt.getSampleRate
      val out = new Array[Float](dim)
      out(0) = fmt.getSampleRate
      out(1) = durationMs.toFloat
      out(2) = channels.toFloat
      val nSeg = dim - 5
      val stride = math.max(1L, totalFrames / 65536L)
      val segSum = new Array[Double](nSeg)
      val segN = new Array[Long](nSeg)
      var sumSq = 0.0; var peak = 0.0; var n = 0L; var frame = 0L
      val buf = new Array[Byte](frameBytes)
      val big = fmt.isBigEndian
      var eof = false
      try {
        while (!eof && frame < totalFrames) {
          var read = 0
          while (read < frameBytes && !eof) {
            val r = ais.read(buf, read, frameBytes - read)
            if (r < 0) eof = true else read += r
          }
          if (!eof) {
            // mean over channels of this frame's 16-bit samples
            var c = 0; var s = 0.0
            while (c < channels) {
              val lo = buf(c * 2 + (if (big) 1 else 0)) & 0xff
              val hi = buf(c * 2 + (if (big) 0 else 1))
              s += ((hi << 8) | lo).toShort / 32768.0
              c += 1
            }
            s /= channels
            val a = math.abs(s)
            sumSq += s * s; if (a > peak) peak = a; n += 1
            val seg = math.min(nSeg - 1, (frame * nSeg / totalFrames).toInt)
            segSum(seg) += s * s; segN(seg) += 1
            frame += 1
            // the bounded budget is real: SKIP the unsampled frames instead
            // of reading them one by one (a 1-hour clip would otherwise pay
            // O(totalFrames) reads through the conversion stream)
            if (stride > 1) {
              var toSkip = math.min(stride - 1, totalFrames - frame) * frameBytes
              while (toSkip > 0 && !eof) {
                val sk = ais.skip(toSkip)
                if (sk <= 0) eof = true else toSkip -= sk
              }
              frame += math.min(stride - 1, totalFrames - frame)
            }
          }
        }
      } finally ais.close()
      if (n == 0) return null
      out(3) = math.sqrt(sumSq / n).toFloat
      out(4) = peak.toFloat
      var i = 0
      while (i < nSeg) {
        out(5 + i) = if (segN(i) == 0) 0f else math.sqrt(segSum(i) / segN(i)).toFloat
        i += 1
      }
      out
    } catch { case _: Throwable => null }
    finally ais0.close()
  }

  /** Deterministic mono 16-bit PCM WAV bytes from a seed — real, decodable
    * audio payloads for tests and the synthetic media table: a seed-pitched
    * sine with a linear fade-out, 8 kHz, 400 + (seed mod 800) frames.
    */
  def syntheticWav(seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val rate = 8000f
    val nFrames = 400 + math.floorMod(seed, 800L).toInt
    val freq = 200.0 + math.floorMod(seed * 7919L, 1800L)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val fade = 1.0 - i.toDouble / nFrames
      val v = (math.sin(2 * math.Pi * freq * i / rate) * fade * 20000).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real image decode: width, height, per-channel RGB means in [0,1], and
    * a luminance histogram over the remaining `dim - 5` slots. Pixels are
    * sampled on a stride so cost is bounded (~4096 pixels) regardless of
    * image size. Returns null for null or undecodable payloads (corrupt
    * image semantics).
    */
  def decodeImage(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null || dim < 6) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](dim)
    out(0) = w.toFloat
    out(1) = h.toFloat
    val stride = math.max(1, math.sqrt(w.toLong * h / 4096.0).toInt)
    val nBins = dim - 5
    val hist = new Array[Long](nBins)
    var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b; n += 1
        val lum = (r * 299 + g * 587 + b * 114) / 1000 // 0..255
        hist(math.min(nBins - 1, lum * nBins / 256)) += 1
        x += stride
      }
      y += stride
    }
    out(2) = (sr.toDouble / (n * 255.0)).toFloat
    out(3) = (sg.toDouble / (n * 255.0)).toFloat
    out(4) = (sb.toDouble / (n * 255.0)).toFloat
    var i = 0
    while (i < nBins) { out(5 + i) = (hist(i).toDouble / n).toFloat; i += 1 }
    out
  }

  /** Deterministic 8x8 PNG bytes from a seed — real, decodable image
    * payloads for tests and the synthetic media table.
    */
  def syntheticPng(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var v = seed * 6364136223846793005L + (y * 8 + x) * 1442695040888963407L
        v ^= (v >>> 33)
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Real multi-frame "video" decode for animated-GIF payloads (pure JDK:
    * ImageIO's GIF reader exposes every frame): [0]=frame count, [1]=width,
    * [2]=height, [3..dim-1]=mean luminance in [0,1] of up to `dim - 3`
    * frames sampled evenly across the clip (a temporal luminance envelope).
    * Per-frame pixel cost is bounded by a stride (~1k pixels/frame). True
    * video codec formats (mp4/webm/...) have no JDK decoder — those fall
    * back to the marked [[decodeStub]], as does any unreadable payload.
    */
  def decodeVideo(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    // the pipeline contract is "null features only for a null payload"; a
    // dim too small for the [count,w,h,lum...] layout degrades to the
    // deterministic stub features rather than misreporting the row as absent
    if (dim < 4) return decodeStub(payload, dim)
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: Throwable => return decodeStub(payload, dim) }
    // createImageInputStream returns null when no ImageInputStream SPI is
    // registered — without this check the finally close() would throw NPE
    // out of the executor task instead of degrading to the stub
    if (iis == null) return decodeStub(payload, dim)
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return decodeStub(payload, dim)
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        if (n <= 0) return decodeStub(payload, dim)
        val out = new Array[Float](dim)
        out(0) = n.toFloat
        out(1) = reader.getWidth(0).toFloat
        out(2) = reader.getHeight(0).toFloat
        val nSample = math.min(dim - 3, n)
        var s = 0
        while (s < nSample) {
          val fi = if (nSample == 1) 0 else (s.toLong * (n - 1) / (nSample - 1)).toInt
          val img = reader.read(fi)
          val w = img.getWidth; val h = img.getHeight
          val stride = math.max(1, math.sqrt(w.toLong * h / 1024.0).toInt)
          var lum = 0L; var np = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              lum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              np += 1
              x += stride
            }
            y += stride
          }
          out(3 + s) = if (np == 0) 0f else (lum.toDouble / (np * 255.0)).toFloat
          s += 1
        }
        out
      } finally reader.dispose()
    } catch { case _: Throwable => decodeStub(payload, dim) }
    finally iis.close()
  }

  /** Deterministic multi-frame animated-GIF bytes from a seed — real,
    * decodable "video" payloads (2-5 frames of 8x8) for tests and the
    * synthetic media table; [[decodeVideo]] reads every frame back.
    */
  def syntheticGif(seed: Long): Array[Byte] = {
    val nFrames = 2 + math.floorMod(seed, 4L).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var v = (seed + f * 1000003L) * 6364136223846793005L +
            (y * 8 + x) * 1442695040888963407L
          v ^= (v >>> 33)
          img.setRGB(x, y, (v & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** STUB decoder (video CODEC formats only — images, audio, and GIF video
    * decode for real above): deterministic pseudo-features from the payload
    * bytes. A real implementation decodes the video and extracts features;
    * the contract (fixed-length float array per row, null payload -> null
    * features) is what the pipeline depends on.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    // a negative dim must degrade (empty features), not throw
    // NegativeArraySizeException inside an executor task
    val out = new Array[Float](math.max(dim, 0))
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

  /** Deterministic synthetic media table derived from the documents table —
    * the test/bench input. Image rows carry REAL 8x8 PNG payloads
    * ([[syntheticPng]], decodable by [[decodeImage]]); audio rows carry REAL
    * mono PCM WAV payloads ([[syntheticWav]], decodable by [[decodeAudio]]);
    * video rows carry REAL multi-frame animated-GIF payloads
    * ([[syntheticGif]], decodable by [[decodeVideo]]).
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(idCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(xxhash64(col(idCol), lit(3)), lit(600000)) + 1).cast("long").as("duration_ms"))
    val enc = org.apache.spark.sql.Encoders.row(base.schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        r.getString(1) match {
          case "image" => Row.fromSeq(r.toSeq.updated(2, syntheticPng(r.getLong(0))))
          case "audio" => Row.fromSeq(r.toSeq.updated(2, syntheticWav(r.getLong(0))))
          case "video" => Row.fromSeq(r.toSeq.updated(2, syntheticGif(r.getLong(0))))
          case _       => r
        }
      }
    }(enc)
  }

  /** Batched feature extraction: mapPartitions over (media_id, kind,
    * payload), emitting (media_id, features array<float>). Image, audio, and
    * GIF-video rows decode for real ([[decodeImage]], [[decodeAudio]],
    * [[decodeVideo]]); codec-format video falls back to the marked stub
    * inside decodeVideo. Batching shape mirrors a vectorized-UDF
    * pipeline: rows are processed in fixed-size batches so a real decoder
    * can amortize model/codec setup per batch; partitioning is preserved
    * (no shuffle).
    */
  def extractFeatures(media: DataFrame, dim: Int = 16, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup happens here in a real decoder
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
            val feats = r.getString(1) match {
              case "image" => decodeImage(payload, dim)
              case "audio" => decodeAudio(payload, dim)
              // real for GIF; codec formats fall back to the marked stub
              case _       => decodeVideo(payload, dim)
            }
            Row(id, feats)
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
