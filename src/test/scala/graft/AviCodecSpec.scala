package graft

import java.awt.image.BufferedImage

import graft.multimodal.{AviCodec, Binary}
import org.apache.spark.sql.functions._

class AviCodecSpec extends SparkSpec {
  import spark.implicits._

  private def frame(w: Int, h: Int, t: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 13 + t * 31) % 256
        val g = (x * 3 + y * 5 + t * 17) % 256
        val b = (x * 11 + y * 2 + t * 23) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  test("DIB AVI round-trips pixel-exact: probe facts + every frame, every pixel") {
    val (w, h, n, fps) = (21, 13, 5, 12) // odd width exercises row padding
    val avi = AviCodec.encodeDib((0 until n).map(frame(w, h, _)), fps)
    val info = AviCodec.probe(avi)
    assert(info == AviCodec.VideoInfo(w, h, n, fps, 1, ok = true))
    val decoded = AviCodec.frames(avi)
    assert(decoded.size == n)
    for (t <- 0 until n; y <- 0 until h; x <- 0 until w)
      assert((decoded(t).getRGB(x, y) & 0xFFFFFF) == (frame(w, h, t).getRGB(x, y) & 0xFFFFFF),
        s"pixel mismatch at t=$t x=$x y=$y")
  }

  test("MJPEG AVI: container facts exact, frames decode via imageio at right dims") {
    val (w, h, n, fps) = (32, 24, 4, 25)
    val avi = AviCodec.encodeMjpeg((0 until n).map(frame(w, h, _)), fps)
    val info = AviCodec.probe(avi)
    assert(info == AviCodec.VideoInfo(w, h, n, fps, 1, ok = true))
    val decoded = AviCodec.frames(avi)
    assert(decoded.size == n)
    assert(decoded.forall(f => f.getWidth == w && f.getHeight == h))
    // JPEG is lossy but close: mean abs luminance error under 16/255
    val orig = frame(w, h, 0)
    val dec = decoded.head
    val err = (for (y <- 0 until h; x <- 0 until w) yield {
      def lum(rgb: Int) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
      math.abs(lum(orig.getRGB(x, y)) - lum(dec.getRGB(x, y)))
    }).sum / (w * h)
    assert(err < 16.0, s"mean luma error $err")
  }

  test("junk, truncated and foreign payloads degrade to ok=false / empty, never throw") {
    assert(!AviCodec.probe(null).ok)
    assert(!AviCodec.probe(Array.emptyByteArray).ok)
    assert(!AviCodec.probe("RIFFxxxxWAVE".getBytes).ok) // RIFF but not AVI
    assert(!AviCodec.probe(Array.fill[Byte](100)(42)).ok)
    assert(AviCodec.frames(Array.fill[Byte](100)(42)).isEmpty)
    // a real AVI truncated mid-movi: header probe still reads facts,
    // the frame walk stops cleanly at the cut instead of throwing
    val avi = AviCodec.encodeDib((0 until 4).map(frame(16, 12, _)), 10)
    val cut = avi.take(avi.length / 2)
    AviCodec.frames(cut) // must not throw; partial frames acceptable
    assert(AviCodec.frameLumSums(cut).size <= 4)
  }

  test("LIST-nesting bomb: 80k-deep nested LIST headers walk without stack overflow") {
    // ~1 MB of nothing but nested 12-byte LIST headers — the payload
    // that turned the recursive chunk walk into StackOverflowError
    // (an Error the per-file Exception guards never catch). The
    // iterative walk must degrade to ok=false / empty instead.
    val depth = 80000
    val bomb = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bomb.put("RIFF".getBytes("US-ASCII")).putInt(4 + depth * 12)
      .put("AVI ".getBytes("US-ASCII"))
    for (d <- (depth - 1) to 0 by -1) // innermost len 4, each wrapper +12
      bomb.put("LIST".getBytes("US-ASCII")).putInt(4 + d * 12)
        .put("hdrl".getBytes("US-ASCII"))
    val payload = bomb.array()
    assert(!AviCodec.probe(payload).ok)
    assert(AviCodec.frames(payload).isEmpty)
    assert(AviCodec.frameLumSums(payload).isEmpty)
  }

  test("fuzz: random byte mutations of a valid AVI never throw") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic CI
    val avi = AviCodec.encodeDib((0 until 3).map(frame(12, 10, _)), 10)
    for (i <- 0 until 600) {
      val b = avi.clone()
      val nMut = 1 + rnd.nextInt(8)
      // half the rounds target the header region (avih/strh dwords —
      // where a mutation can claim absurd dimensions or counts)
      val span = if (i % 2 == 0) math.min(120, b.length) else b.length
      for (_ <- 0 until nMut) b(rnd.nextInt(span)) = rnd.nextInt(256).toByte
      // any of: clean decode, partial decode, ok=false — but no throw
      AviCodec.probe(b)
      AviCodec.frames(b)
      AviCodec.frameLumSums(b)
    }
    for (_ <- 0 until 100) { // truncations at arbitrary points
      val cut = avi.take(rnd.nextInt(avi.length))
      AviCodec.probe(cut); AviCodec.frames(cut)
    }
  }

  test("frameLumSums matches the per-pixel integer formula") {
    val (w, h) = (9, 7)
    val avi = AviCodec.encodeDib(Seq(frame(w, h, 2)), 10)
    val expected = (for (y <- 0 until h; x <- 0 until w) yield {
      val r = (x * 7 + y * 13 + 2 * 31) % 256
      val g = (x * 3 + y * 5 + 2 * 17) % 256
      val b = (x * 11 + y * 2 + 2 * 23) % 256
      299L * r + 587L * g + 114L * b
    }).sum
    assert(AviCodec.frameLumSums(avi) == Seq(expected))
  }

  test("videoFrameStage samples evenly-spaced frames with the sampleFrames index rule") {
    val avi = AviCodec.encodeDib((0 until 9).map(frame(8, 6, _)), 10)
    val df = Seq((1L, avi)).toDF("id", "payload")
    val picked = Binary.videoFrameStage(df, "payload", 4)
      .select("frame_idx").as[Int].collect().toSeq.sorted
    assert(picked == Seq(0, 2, 4, 6)) // floor(i*9/4) for i in 0..3
    val few = Binary.videoFrameStage(
      Seq((1L, AviCodec.encodeDib((0 until 2).map(frame(8, 6, _)), 10))).toDF("id", "payload"),
      "payload", 4).select("frame_idx").as[Int].collect().toSeq.sorted
    assert(few == Seq(0, 1)) // fewer frames than n → all of them
  }

  test("videoDecodeStage appends header facts; junk rows flow through as ok=false") {
    val avi = AviCodec.encodeDib((0 until 3).map(frame(10, 10, _)), 30)
    val df = Seq((1L, avi), (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val out = Binary.videoDecodeStage(df, "payload").orderBy("id")
      .select("video_info.width", "video_info.frames", "video_info.fps_num", "video_info.ok")
      .collect()
    assert(out(0).getInt(0) == 10 && out(0).getInt(1) == 3 && out(0).getInt(2) == 30 && out(0).getBoolean(3))
    assert(!out(1).getBoolean(3))
  }
}
