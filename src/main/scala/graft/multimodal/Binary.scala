package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as an
  * opaque `binary` column plus a typed metadata struct, with batched
  * per-partition transforms for the decode/feature-extract stages.
  *
  * IMAGE decode and pixel features are REAL ([[ImageIoDecoder]] /
  * [[ImageGridFeatures]], on the JDK's built-in `javax.imageio`
  * codecs — PNG/JPEG/GIF/BMP; gate-checked end to end by
  * `q80b_image_decode`). AUDIO decode is REAL ([[JavaSoundAudio]] on
  * `javax.sound.sampled` — WAV/AIFF/AU PCM; `q80c_audio_decode`).
  * VIDEO container decode and frame extraction are REAL
  * ([[AviCodec]] — AVI RIFF mux/demux with uncompressed-DIB and
  * MJPEG frames; `q80d_video_decode`). Only compressed codecs the
  * JVM doesn't ship (H.264, MP3/OGG) keep the deterministic
  * [[StubDecoder]] / [[HashFeatures]] stand-ins; the Spark-side
  * contract — schema, partition-batched execution, metadata
  * propagation — is identical, so a JNI/codec-backed [[Decoder]]
  * drops in with no other change.
  *
  * Scale notes: payloads never pass through a shuffle — metadata is
  * extracted in a projection over the scan, and decode runs
  * `mapPartitions`-style on the scan partitions. Repartition by a
  * small key-only frame if needed BEFORE attaching payloads.
  */
object Binary {

  /** Decoded-media facts a real codec would produce. */
  final case class MediaInfo(width: Int, height: Int, frames: Int, ok: Boolean)

  /** The pluggable decode stage: bytes → MediaInfo, called once per
    * row inside a partition batch (open/close any native context per
    * PARTITION, not per row, in a real implementation). */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): MediaInfo
  }

  /** Deterministic fake decoder: dimensions derived from payload
    * bytes. Stands in for codecs the JVM doesn't ship (audio/video)
    * and keeps CI fixtures format-independent. */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte]): MediaInfo = {
      var h = 1125899906842597L // FNV-ish rolling hash, stable across JVMs
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      val w = 16 + (Math.floorMod(h, 240L)).toInt
      val ht = 16 + (Math.floorMod(h >> 8, 240L)).toInt
      MediaInfo(w, ht, 1 + Math.floorMod(h >> 16, 30L).toInt, ok = payload.nonEmpty)
    }
  }

  /** REAL image decode on the JVM's built-in codecs (`javax.imageio`
    * — PNG/JPEG/GIF/BMP ship with the JDK, no new dependency).
    * Width/height come from the header (no full pixel decode — cheap
    * enough for a 100 TB metadata pass); `frames` counts images in
    * the container (animated GIF > 1). Undecodable or truncated bytes
    * degrade to `ok = false`, never an exception — one bad file in a
    * billion must not kill a partition. */
  object ImageIoDecoder extends Decoder {
    def decode(payload: Array[Byte]): MediaInfo = {
      if (payload == null || payload.isEmpty) return MediaInfo(0, 0, 0, ok = false)
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) MediaInfo(0, 0, 0, ok = false)
          else {
            val r = readers.next()
            try {
              r.setInput(in)
              val frames =
                try { val n = r.getNumImages(true); if (n < 1) 1 else n }
                catch { case _: Exception => 1 }
              MediaInfo(r.getWidth(0), r.getHeight(0), frames, ok = true)
            } finally r.dispose()
          }
        } finally if (in != null) in.close()
      } catch { case _: Exception => MediaInfo(0, 0, 0, ok = false) }
    }
  }

  /** The pluggable feature stage: payload bytes → `dim` floats. */
  trait FeatureExtractor extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic pseudo-embedding from a rolling hash (the CI-safe
    * default — format-independent, stable across JVMs). */
  object HashFeatures extends FeatureExtractor {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 16).toInt % 1000) / 1000.0f
        d += 1
      }
      out
    }
  }

  /** REAL pixel features: full `javax.imageio` decode, then mean
    * luminance (ITU-R BT.601 in [0,1]) pooled over a √dim × √dim
    * grid — the classic thumbnail-embedding baseline, deterministic
    * for a given image. Undecodable payloads embed as all-zero
    * (distinguishable and cluster-stable) rather than throwing. */
  object ImageGridFeatures extends FeatureExtractor {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return out
      val g = math.max(1, math.sqrt(dim.toDouble).toInt)
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Double](g * g)
      val counts = new Array[Long](g * g)
      var y = 0
      while (y < h) {
        val gy = math.min(g - 1, y * g / h)
        var x = 0
        while (x < w) {
          val gx = math.min(g - 1, x * g / w)
          val rgb = img.getRGB(x, y)
          val lum = (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)) / 255.0
          val c = gy * g + gx
          sums(c) += lum; counts(c) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < g * g && c < dim) {
        out(c) = if (counts(c) == 0) 0f else (sums(c) / counts(c)).toFloat
        c += 1
      }
      out
    }
  }

  /** Decoded-audio facts + whole-clip signal stats (one pass over the
    * PCM frames — at 100 TB the stats ride along with the decode
    * instead of a second pass over the payload bytes). */
  final case class AudioInfo(channels: Int, sampleRate: Int, nSamples: Int,
                             rms: Double, zeroCrossings: Long, ok: Boolean)

  /** REAL audio decode on the JVM's built-in `javax.sound.sampled`
    * codecs (WAV/AIFF/AU containers, PCM payloads — ship with the JDK,
    * no new dependency; gate-checked end to end by
    * `q80c_audio_decode`). Handles signed 16-bit PCM either
    * endianness; other encodings (float, µ-law, 8/24-bit) surface
    * their header facts with `ok = false` rather than guessing a
    * sample interpretation. Junk/truncated bytes degrade to
    * `ok = false`, never an exception. Compressed formats (MP3/OGG)
    * have no stock-JVM codec — those fall back to [[StubDecoder]]
    * plumbing until a codec-backed decoder drops in. */
  object JavaSoundAudio extends Serializable {
    def decode(payload: Array[Byte]): AudioInfo = {
      if (payload == null || payload.isEmpty) return AudioInfo(0, 0, 0, 0.0, 0L, ok = false)
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              f.getSampleSizeInBits != 16)
            return AudioInfo(f.getChannels, f.getSampleRate.toInt, 0, 0.0, 0L, ok = false)
          val bytes = ais.readAllBytes()
          val big = f.isBigEndian
          val ch = math.max(1, f.getChannels)
          val n = bytes.length / 2
          var i = 0
          var sumSq = 0.0
          var zc = 0L
          while (i < n) {
            val s =
              if (big) ((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff)).toShort.toInt
              else ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            sumSq += s.toDouble * s
            // zero-crossings compare each sample with the PREVIOUS
            // sample of the SAME channel (samples interleave per
            // frame) — an interleaved compare counts phantom
            // crossings between channels on any stereo file
            if (i >= ch) {
              val p =
                if (big) ((bytes(2 * (i - ch)).toInt << 8) | (bytes(2 * (i - ch) + 1) & 0xff)).toShort.toInt
                else ((bytes(2 * (i - ch) + 1).toInt << 8) | (bytes(2 * (i - ch)) & 0xff)).toShort.toInt
              if (s.toLong * p < 0) zc += 1
            }
            i += 1
          }
          AudioInfo(ch, f.getSampleRate.toInt, n / ch,
            if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0, zc, ok = true)
        } finally ais.close()
      } catch { case _: Exception => AudioInfo(0, 0, 0, 0.0, 0L, ok = false) }
    }
  }

  /** Audio decode stage: per-partition batched [[JavaSoundAudio]]
    * application, appending an `audio_info` struct. Same contract as
    * [[decodeStage]]: payloads never shuffle, bad rows degrade. */
  def audioDecodeStage(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio_info",
      StructType(Seq(
        StructField("channels", IntegerType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("n_samples", IntegerType, nullable = false),
        StructField("rms", DoubleType, nullable = false),
        StructField("zero_crossings", LongType, nullable = false),
        StructField("ok", BooleanType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val info = JavaSoundAudio.decode(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(info.channels, info.sampleRate, info.nSamples,
          info.rms, info.zeroCrossings, info.ok))
      }
    }(enc)
  }

  /** Nearest-neighbor image resize — REAL decode → scale → re-encode
    * on the stock JVM. Nearest-neighbor by explicit integer mapping
    * (dst(x,y) = src(⌊x·sw/dw⌋, ⌊y·sh/dh⌋)) rather than Graphics2D
    * interpolation: the result is pixel-DETERMINISTIC, so a SQL
    * oracle can replay the resampled pixels from first principles.
    * Undecodable payloads pass through as null bytes, never throw. */
  def resizeImage(payload: Array[Byte], dw: Int, dh: Int): Array[Byte] = {
    require(dw > 0 && dh > 0)
    if (payload == null || payload.isEmpty) return null
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (src == null) return null
    val (sw, sh) = (src.getWidth, src.getHeight)
    val dst = new java.awt.image.BufferedImage(
      dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * sh / dh).toInt
      var x = 0
      while (x < dw) {
        dst.setRGB(x, y, src.getRGB((x.toLong * sw / dw).toInt, sy) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Exact integer luminance statistic of a decoded image:
    * Σ(299R + 587G + 114B) — BT.601 ×1000, a BIGINT any engine
    * reproduces (same contract as [[AviCodec.frameLumSums]]).
    * Undecodable → −1 (distinguishable from a black image's 0). */
  def imageLumSum(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) return -1L
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return -1L
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Resize stage: per-partition batched [[resizeImage]], appending a
    * `resized` binary column. Payloads never shuffle; bad rows carry
    * null through. */
  def resizeStage(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", org.apache.spark.sql.types.BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ resizeImage(r.getAs[Array[Byte]](idx), w, h)))
    }(enc)
  }

  /** Luminance-statistic stage: per-partition batched
    * [[imageLumSum]], appending `lum_sum`. */
  def lumSumStage(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("lum_sum", LongType, nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ imageLumSum(r.getAs[Array[Byte]](idx))))
    }(enc)
  }

  /** Video decode stage: per-partition batched [[AviCodec.probe]]
    * (REAL container parse — see AviCodec for the format notes),
    * appending a `video_info` struct. Header-only: frame payloads are
    * not decoded, so this is a cheap 100 TB metadata pass. */
  def videoDecodeStage(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("video_info",
      StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("frames", IntegerType, nullable = false),
        StructField("fps_num", IntegerType, nullable = false),
        StructField("fps_den", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val v = AviCodec.probe(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(v.width, v.height, v.frames, v.fpsNum, v.fpsDen, v.ok))
      }
    }(enc)
  }

  /** Video frame-sample + feature stage: decode the container ONCE per
    * row, pick min(`n`, frames) evenly-spaced frames (same index rule
    * as [[sampleFrames]]) and emit one output row per sampled frame
    * with its exact integer luminance statistic
    * ([[AviCodec.frameLumSums]]). Payloads never shuffle; undecodable
    * rows emit nothing (same contract as explode on an empty array). */
  def videoFrameStage(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    require(n >= 1)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("lum_sum", LongType, nullable = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val sums = AviCodec.frameLumSums(r.getAs[Array[Byte]](idx))
        val total = sums.length
        val picks =
          if (total <= n) 0 until total
          else (0 until n).map(i => (i.toLong * total / n).toInt)
        picks.map(fi => Row.fromSeq(r.toSeq ++ Seq[Any](fi, sums(fi))))
      }
    }(enc)
  }

  /** Cheap metadata over the payload — pure column expressions
    * (codegen'd): byte size, content md5, leading-bytes magic. */
  def withMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(payloadCol)).as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"),
      hex(substring(col(payloadCol), 1, 4)).as("magic")))

  /** Decode stage: per-partition batched application of `decoder`,
    * appending a `media_info` struct. Row-encoder based so it works
    * for any input schema. */
  def decodeStage(df: DataFrame, payloadCol: String,
                  decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("media_info",
      StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("frames", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init happens here (native codec handle, etc.)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null payload (failed fetch) must not kill the stage — it
        // decodes to ok=false like any other undecodable media
        val info =
          if (bytes == null) MediaInfo(0, 0, 0, ok = false)
          else decoder.decode(bytes)
        Row.fromSeq(r.toSeq :+ Row(info.width, info.height, info.frames, info.ok))
      }
    }(enc)
  }

  /** Feature-extraction stage: payload bytes → fixed-width embedding
    * (`dim` floats). The real pipeline would run a vision/audio model
    * here; the stub derives a deterministic pseudo-embedding from a
    * rolling hash so the downstream contract — `array<float>` column
    * feeding [[graft.operators.Similarity]] — is exercised end to end. */
  def featureStage(df: DataFrame, payloadCol: String, dim: Int = 16,
                   extractor: FeatureExtractor = HashFeatures): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes0 = r.getAs[Array[Byte]](idx)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        Row.fromSeq(r.toSeq :+ extractor.features(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling shape: explode exactly min(`n`, frames)
    * evenly-spaced frame indexes per media row (zero-frame rows emit
    * nothing — explode drops the empty array). Keeps the payload
    * un-shuffled; output is (input columns, frame_idx). */
  def sampleFrames(df: DataFrame, framesCol: String, n: Int): DataFrame = {
    require(n >= 1)
    val frames = col(framesCol)
    val idxs = when(frames <= 0, array().cast("array<int>"))
      .when(frames <= n, sequence(lit(0), frames.cast("int") - 1))
      .otherwise(transform(sequence(lit(0), lit(n - 1)),
        i => floor(i * frames / n).cast("int")))
    df.withColumn("frame_idx", explode(idxs))
  }
}
