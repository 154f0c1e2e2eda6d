package graft

import graft.multimodal.Binary
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "fake-image-bytes-aaaa"),
    (2L, "fake-video-bytes-bbbb-longer-payload"),
  ).toDF("id", "s").withColumn("payload", col("s").cast("binary")).drop("s")

  test("withMeta extracts byte length, md5 and magic as a typed struct") {
    val r = Binary.withMeta(media, "payload").orderBy("id")
      .select("id", "media_meta.n_bytes", "media_meta.magic").collect()
    assert(r(0).getInt(1) == "fake-image-bytes-aaaa".getBytes.length)
    assert(r(0).getString(2) == "66616B65") // hex of "fake"
  }

  test("decodeStage appends deterministic media_info without touching input columns") {
    val out = Binary.decodeStage(media, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "media_info"))
    val r1 = out.orderBy("id").select("media_info.width", "media_info.height", "media_info.ok").collect()
    val r2 = out.orderBy("id").select("media_info.width", "media_info.height", "media_info.ok").collect()
    assert(r1.toSeq == r2.toSeq)                       // deterministic
    assert(r1.forall(_.getBoolean(2)))                 // non-empty payloads decode ok
    assert(r1.forall(r => r.getInt(0) >= 16 && r.getInt(0) < 256))
  }

  test("stereo WAV: zero-crossings count per channel, not across interleaved samples") {
    // constant L=+1000 / R=-1000: neither channel ever crosses zero,
    // but consecutive INTERLEAVED samples alternate sign — the old
    // interleaved compare reported ~2·(frames−1) phantom crossings
    val frames = 200
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](frames * 4)
    for (i <- 0 until frames) {
      val l = 1000; val r = -1000
      pcm(4 * i) = (l & 0xff).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (r & 0xff).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val info = Binary.JavaSoundAudio.decode(bos.toByteArray)
    assert(info.ok && info.channels == 2 && info.nSamples == frames)
    assert(info.zeroCrossings == 0L, s"phantom crossings: ${info.zeroCrossings}")
  }

  test("resizeImage: nearest-neighbor mapping is pixel-exact; junk passes through null") {
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, (x * 16 + y) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val resized = Binary.resizeImage(bos.toByteArray, 4, 3)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 4 && back.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x * 8 / 4, y * 6 / 3) & 0xFFFFFF))
    assert(Binary.resizeImage(Array[Byte](1, 2, 3), 4, 3) == null)
    assert(Binary.imageLumSum(Array[Byte](1, 2, 3)) == -1L)
  }

  test("featureStage feeds the similarity operators end to end") {
    val many = (1L to 50L).map(i => (i, s"payload-number-$i"))
      .toDF("id", "s").withColumn("payload", col("s").cast("binary")).drop("s")
    val feats = graft.multimodal.Binary.featureStage(many, "payload", dim = 8)
    assert(feats.schema("features").dataType.simpleString == "array<float>")
    // identical payloads → identical features → cosine 1.0 via ANN path
    val dup = graft.multimodal.Binary.featureStage(
      many.where(col("id") === 7L).withColumn("id", lit(999L)), "payload", dim = 8)
    val top = graft.operators.Similarity.bruteForceTopK(
      feats.union(dup), "id", "features", probeId = 999L, k = 1).collect()
    assert(top.head.getLong(0) == 7L && top.head.getDouble(1) === 1.0)
  }

  test("ImageIoDecoder decodes real PNG and GIF bytes; corrupt bytes degrade to ok=false") {
    def png(w: Int, h: Int, fmt: String = "png"): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // direct kernel facts
    assert(Binary.ImageIoDecoder.decode(png(12, 34)) == Binary.MediaInfo(12, 34, 1, ok = true))
    assert(Binary.ImageIoDecoder.decode(png(5, 3, "gif")).ok)
    assert(!Binary.ImageIoDecoder.decode("not an image".getBytes).ok)
    assert(!Binary.ImageIoDecoder.decode(png(9, 9).take(10)).ok) // truncated header
    // through the distributed stage
    val df = Seq(1L -> png(64, 48), 2L -> png(3, 3), 3L -> Array[Byte](0, 1))
      .toDF("id", "payload")
    val out = Binary.decodeStage(df, "payload", Binary.ImageIoDecoder)
      .select("id", "media_info.width", "media_info.height", "media_info.ok")
      .orderBy("id").collect()
    assert(out(0).getInt(1) == 64 && out(0).getInt(2) == 48 && out(0).getBoolean(3))
    assert(out(1).getInt(1) == 3 && out(2).getBoolean(3) == false)
  }

  test("ImageGridFeatures pools real pixel luminance into the embedding grid") {
    // left half black, right half white → first grid column ≈ 0,
    // last ≈ 1, for a 4×4 grid over a 16×16 image
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Binary.ImageGridFeatures.features(bos.toByteArray, 16)
    assert(f.length == 16)
    for (row <- 0 until 4) {
      assert(f(row * 4) == 0f, s"grid cell ($row,0) should be black")
      assert(math.abs(f(row * 4 + 3) - 1f) < 1e-3, s"grid cell ($row,3) should be white")
    }
    // undecodable → all-zero embedding, not an exception
    assert(Binary.ImageGridFeatures.features("junk".getBytes, 16).forall(_ == 0f))
    // and it rides the existing featureStage plumbing unchanged
    val feats = Binary.featureStage(
      Seq(1L -> bos.toByteArray).toDF("id", "payload"), "payload",
      dim = 16, extractor = Binary.ImageGridFeatures)
    assert(feats.select("features").head().getSeq[Float](0).length == 16)
  }

  test("sampleFrames explodes exactly min(n, frames) indexes; 0-frame rows drop") {
    val df = Seq((1L, 10), (2L, 2), (3L, 0)).toDF("id", "frames")
    val sampled = Binary.sampleFrames(df, "frames", n = 3)
    val byId = sampled.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Int]("frame_idx")).sorted.toSeq).toMap
    assert(byId(1L) == Seq(0, 3, 6))   // 3 evenly-spaced of 10
    assert(byId(2L) == Seq(0, 1))      // fewer frames than n → all
    assert(!byId.contains(3L))         // zero frames → no rows
  }

  test("decodeStage survives null payloads as ok=false") {
    val withNull = media.union(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "s")
        .withColumn("payload", col("s").cast("binary")).drop("s"))
    val out = Binary.decodeStage(withNull, "payload")
      .select("id", "media_info.ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(3L) == false && out(1L) == true)
  }

  private def pcmWav(samples: Array[Int], rate: Float, channels: Int,
                     bigEndian: Boolean, fileType: javax.sound.sampled.AudioFileFormat.Type =
                       javax.sound.sampled.AudioFileFormat.Type.WAVE): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, bigEndian)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      if (bigEndian) { bytes(2 * i) = ((v >> 8) & 0xff).toByte; bytes(2 * i + 1) = (v & 0xff).toByte }
      else { bytes(2 * i) = (v & 0xff).toByte; bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  test("JavaSoundAudio: known samples round-trip exactly, both endiannesses") {
    val samples = Array(1000, -1000, 2000, -2000, 0, 500)
    // RMS from first principles over the exact integers
    val rms = math.sqrt(samples.map(v => v.toDouble * v).sum / samples.length) / 32768.0
    val le = Binary.JavaSoundAudio.decode(pcmWav(samples, 8000f, 1, bigEndian = false))
    assert(le.ok && le.channels == 1 && le.sampleRate == 8000 && le.nSamples == 6)
    assert(math.abs(le.rms - rms) < 1e-12)
    assert(le.zeroCrossings == 3) // +→−, −→+, +→−; −→0 and 0→+ don't cross
    val be = Binary.JavaSoundAudio.decode(
      pcmWav(samples, 8000f, 1, bigEndian = true,
        fileType = javax.sound.sampled.AudioFileFormat.Type.AIFF))
    assert(be.ok && be.rms == le.rms && be.zeroCrossings == le.zeroCrossings)
  }

  test("JavaSoundAudio: stereo frame count, junk and empty degrade to ok=false") {
    val st = Binary.JavaSoundAudio.decode(pcmWav(Array(1, 2, 3, 4, 5, 6), 44100f, 2, bigEndian = false))
    assert(st.ok && st.channels == 2 && st.nSamples == 3) // 6 samples / 2 channels
    assert(!Binary.JavaSoundAudio.decode(Array[Byte](1, 2, 3, 4)).ok)
    assert(!Binary.JavaSoundAudio.decode(Array.emptyByteArray).ok)
    assert(!Binary.JavaSoundAudio.decode(null).ok)
  }

  test("JNI seam: a non-JDK Decoder double drops into decode → feature → similarity unchanged") {
    // The Binary header claims a JNI/codec-backed Decoder drops in
    // with no other change. Prove it with FakeH264 (below): a decoder
    // for a format no JDK codec knows, registered ONLY through the
    // documented decodeStage/featureStage parameters — the pipeline
    // code is byte-for-byte the one the stock decoders use.
    def h264(w: Int, h: Int, frames: Int, filler: Byte): Array[Byte] =
      Array[Byte](0, 0, 0, 1, (w / 16).toByte, (h / 16).toByte, frames.toByte) ++
        Array.fill[Byte](16)(filler)
    val rows = Seq(
      (1L, h264(1280, 720, 24, 7)),
      (2L, h264(1280, 720, 24, 7)),       // exact duplicate of 1
      (3L, h264(640, 480, 10, 9)),
      (4L, "not-a-nal-unit".getBytes.map(_.toByte)),
    ).toDF("vec_id", "payload")
    val decoded = Binary.decodeStage(Binary.withMeta(rows, "payload"), "payload", FakeH264)
    val got = decoded.orderBy("vec_id")
      .select("media_info.width", "media_info.height", "media_info.frames", "media_info.ok")
      .collect()
    assert(got(0).getInt(0) == 1280 && got(0).getInt(1) == 720 && got(0).getInt(2) == 24)
    assert(got(0).getBoolean(3) && got(2).getInt(0) == 640)
    assert(!got(3).getBoolean(3)) // junk degrades, never throws
    // feature stage with the matching extractor double, then the
    // standard similarity operator over the produced embeddings
    val feats = Binary.featureStage(decoded, "payload", dim = 8, FakeH264Features)
      .select(col("vec_id"), col("features").as("embedding"))
    assert(feats.head().getSeq[Float](1).size == 8)
    val top = graft.operators.Similarity
      .bruteForceTopK(feats, "vec_id", "embedding", probeId = 1L, k = 1).head()
    assert(top.getLong(0) == 2L, s"dup payload should be nearest, got $top")
    assert(top.getDouble(1) == 1.0)
  }
}

/** Test-double "H.264" decoder: consumes an Annex-B-shaped payload
  * (NAL start code 00 00 00 01, then a fake SPS byte pair carrying
  * width/16, height/16 and a frame count) — a format no JDK codec
  * understands, standing in for a JNI-backed library. Top-level
  * object so the Spark closure ships it without dragging the spec
  * instance along. */
object FakeH264 extends Binary.Decoder {
  def decode(p: Array[Byte]): Binary.MediaInfo =
    if (p != null && p.length >= 7 && p(0) == 0 && p(1) == 0 && p(2) == 0 && p(3) == 1)
      Binary.MediaInfo((p(4) & 0xff) * 16, (p(5) & 0xff) * 16, p(6) & 0xff, ok = true)
    else Binary.MediaInfo(0, 0, 0, ok = false)
}

/** Matching feature-extractor double: embeds the fake bitstream's
  * bytes (deterministic, content-addressed — identical payloads give
  * identical embeddings, so similarity search finds exact dups). */
object FakeH264Features extends Binary.FeatureExtractor {
  def features(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255f; i += 1 }
    out
  }
}
