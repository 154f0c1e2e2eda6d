package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** REAL video container codec on a stock JVM: mux/demux of the
  * Microsoft AVI RIFF container (public spec: RIFF 'AVI ' with an
  * 'hdrl' header list, a 'movi' frame list and an 'idx1' index).
  *
  * Two frame encodings, both real:
  *  - '00db' uncompressed DIB (BI_RGB 24-bit bottom-up) — fully
  *    decodable with integer-exact pixel values, which is what the
  *    driver-gated query (`q80d_video_decode`) uses so a SQL oracle
  *    can replay the pixel math from first principles.
  *  - '00dc' MJPEG (each frame an ordinary JPEG) — decoded through
  *    `javax.imageio`; spec-covered (JPEG is lossy so exact pixel
  *    oracles don't apply, but container facts and frame counts do).
  *
  * The encoder writes files real players accept (proper avih/strh/strf
  * headers, even-padded chunks, idx1 index). The decoder is tolerant:
  * junk, truncated, or foreign bytes degrade to `ok = false` — one bad
  * file in a billion must not kill a partition.
  *
  * Reference behavior modeled: the reference treats media as opaque
  * binary columns with typed metadata (see SURVEY §2.J); this provides
  * the decode/frame-sample stage the brief requires without any
  * non-JDK dependency.
  */
object AviCodec extends Serializable {

  /** Container facts a decode pass surfaces: dimensions, frame count,
    * frame rate as an exact rational (dwRate/dwScale). */
  final case class VideoInfo(width: Int, height: Int, frames: Int,
                             fpsNum: Int, fpsDen: Int, ok: Boolean)

  private val BadInfo = VideoInfo(0, 0, 0, 0, 0, ok = false)

  // ---- little-endian byte helpers -------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def rd32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
    ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  // ---- encode ---------------------------------------------------------

  /** Mux frames as uncompressed 24-bit DIB ('00db' chunks, BI_RGB
    * bottom-up, rows padded to 4 bytes — the standard Windows bitmap
    * layout). Integer-exact round trip for every pixel. */
  def encodeDib(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val stride = (w * 3 + 3) & ~3
    val payloads = frames.map { img =>
      require(img.getWidth == w && img.getHeight == h, "uniform frame size")
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(row + 3 * x) = (rgb & 0xff).toByte            // B
          out(row + 3 * x + 1) = ((rgb >> 8) & 0xff).toByte  // G
          out(row + 3 * x + 2) = ((rgb >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }
    mux(payloads, "00db", "DIB ", compression = 0, w, h, fps,
        sizeImage = stride * h)
  }

  /** Mux frames as MJPEG ('00dc' chunks, each an ordinary JPEG written
    * by `javax.imageio`; biCompression = 'MJPG'). */
  def encodeMjpeg(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val payloads = frames.map { img =>
      require(img.getWidth == w && img.getHeight == h, "uniform frame size")
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // 'MJPG' as a little-endian fourcc integer
    val mjpg = rd32(fourcc("MJPG"), 0)
    mux(payloads, "00dc", "MJPG", compression = mjpg, w, h, fps,
        sizeImage = 0)
  }

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1 // RIFF chunks pad to even length
    val out = new ByteArrayOutputStream(8 + data.length + pad)
    out.write(fourcc(id)); out.write(le32(data.length)); out.write(data)
    if (pad == 1) out.write(0)
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(12 + body.length)
    out.write(fourcc("LIST")); out.write(le32(4 + body.length))
    out.write(fourcc(kind)); out.write(body)
    out.toByteArray
  }

  private def mux(payloads: Seq[Array[Byte]], frameCc: String,
                  handler: String, compression: Int,
                  w: Int, h: Int, fps: Int, sizeImage: Int): Array[Byte] = {
    val n = payloads.size
    val maxBuf = payloads.map(_.length).max
    val avih = {
      val b = new ByteArrayOutputStream(56)
      b.write(le32(1000000 / fps))      // dwMicroSecPerFrame
      b.write(le32(maxBuf * fps))       // dwMaxBytesPerSec
      b.write(le32(0))                  // dwPaddingGranularity
      b.write(le32(0x10 | 0x100))       // AVIF_HASINDEX | AVIF_ISINTERLEAVED
      b.write(le32(n))                  // dwTotalFrames
      b.write(le32(0))                  // dwInitialFrames
      b.write(le32(1))                  // dwStreams
      b.write(le32(maxBuf))             // dwSuggestedBufferSize
      b.write(le32(w)); b.write(le32(h))
      (0 until 4).foreach(_ => b.write(le32(0))) // dwReserved
      b.toByteArray
    }
    val strh = {
      val b = new ByteArrayOutputStream(56)
      b.write(fourcc("vids")); b.write(fourcc(handler))
      b.write(le32(0)); b.write(le16(0)); b.write(le16(0)) // flags, prio, lang
      b.write(le32(0))                  // dwInitialFrames
      b.write(le32(1)); b.write(le32(fps)) // dwScale / dwRate (fps = rate/scale)
      b.write(le32(0)); b.write(le32(n))   // dwStart / dwLength
      b.write(le32(maxBuf))             // dwSuggestedBufferSize
      b.write(le32(-1))                 // dwQuality (default)
      b.write(le32(0))                  // dwSampleSize (0 = varies)
      b.write(le16(0)); b.write(le16(0)); b.write(le16(w)); b.write(le16(h)) // rcFrame
      b.toByteArray
    }
    val strf = {
      val b = new ByteArrayOutputStream(40)
      b.write(le32(40))                 // biSize
      b.write(le32(w)); b.write(le32(h)) // positive height = bottom-up
      b.write(le16(1)); b.write(le16(24)) // biPlanes / biBitCount
      b.write(le32(compression))        // 0 = BI_RGB, or 'MJPG'
      b.write(le32(sizeImage))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
      b.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = new ByteArrayOutputStream()
    val offsets = payloads.map { p =>
      val off = 4 + moviBody.size() // offset from 'movi' fourcc, per convention
      moviBody.write(chunk(frameCc, p))
      off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val b = new ByteArrayOutputStream(16 * n)
      payloads.zip(offsets).foreach { case (p, off) =>
        b.write(fourcc(frameCc))
        b.write(le32(0x10)) // AVIIF_KEYFRAME
        b.write(le32(off))
        b.write(le32(p.length))
      }
      chunk("idx1", b.toByteArray)
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = new ByteArrayOutputStream(8 + body.length)
    out.write(fourcc("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  // ---- decode ---------------------------------------------------------

  /** Header probe: container facts without touching frame payloads
    * (cheap enough for a 100 TB metadata pass). */
  def probe(payload: Array[Byte]): VideoInfo = {
    if (payload == null || payload.length < 24 ||
        cc(payload, 0) != "RIFF" || cc(payload, 8) != "AVI ") return BadInfo
    try {
      var w, h, frames, fpsNum, fpsDen = 0
      var sawAvih = false
      walkChunks(payload, 12, payload.length) { (id, off, _) =>
        if (id == "avih") {
          frames = rd32(payload, off + 16)
          w = rd32(payload, off + 32); h = rd32(payload, off + 36)
          sawAvih = true
        } else if (id == "strh" && cc(payload, off) == "vids") {
          fpsDen = rd32(payload, off + 20) // dwScale
          fpsNum = rd32(payload, off + 24) // dwRate
        }
      }
      // Sanity bounds: a corrupt header must not drive a huge
      // allocation downstream (a mutated dword can claim 2^31 pixels)
      if (!sawAvih || w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15) ||
          frames < 0 || frames > (1 << 20)) BadInfo
      else VideoInfo(w, h, frames, fpsNum, math.max(fpsDen, 1), ok = true)
    } catch { case _: Exception => BadInfo }
  }

  /** Decode every frame of STREAM 0 to a BufferedImage: '00db' DIB
    * frames via the exact integer path, '00dc' (MJPEG) via
    * `javax.imageio`. Chunks of other streams ('01db', …) are
    * skipped — probe() reports stream 0's dimensions, and decoding a
    * second stream's frames against them would produce garbage on a
    * foreign multi-stream file. Undecodable containers return an
    * empty seq, never throw. */
  def frames(payload: Array[Byte]): Seq[BufferedImage] = {
    val info = probe(payload)
    if (!info.ok) return Seq.empty
    val out = Seq.newBuilder[BufferedImage]
    try {
      walkChunks(payload, 12, payload.length) { (id, off, len) =>
        if (id == "00db")
          decodeDib(payload, off, len, info.width, info.height).foreach(out += _)
        else if (id == "00dc") {
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload.slice(off, off + len)))
            catch { case _: Exception => null }
          if (img != null) out += img
        }
      }
      out.result()
    } catch { case _: Exception => Seq.empty }
  }

  /** Per-frame integer luminance sum Σ(299·R + 587·G + 114·B) — the
    * BT.601 weights scaled ×1000 so the statistic is an exact BIGINT
    * any engine reproduces bit-for-bit (the double division by
    * 255000·w·h is the caller's choice). */
  def frameLumSums(payload: Array[Byte]): Seq[Long] =
    frames(payload).map { img =>
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                 114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      sum
    }

  /** Depth-first chunk walk: calls `f(fourcc, dataOffset, dataLen)` for
    * every non-LIST chunk, descending into LIST bodies ('hdrl', 'strl',
    * 'movi', 'rec '). Bounds-checked; malformed sizes stop that level
    * cleanly. Iterative with an explicit range stack: a crafted AVI can
    * nest 12-byte LIST headers thousands deep in a ~1 MB payload, and a
    * call-stack recursion there throws StackOverflowError — an Error
    * the per-file `catch Exception` guards in probe()/frames() do NOT
    * catch, so one bad file would kill the whole Spark task. */
  private def walkChunks(b: Array[Byte], start: Int, end: Int)
                        (f: (String, Int, Int) => Unit): Unit = {
    var stack = List((start, end)) // (pos, levelEnd) ranges still to walk
    while (stack.nonEmpty) {
      var (p, e) = stack.head
      stack = stack.tail
      var walking = true
      while (walking && p + 8 <= e) {
        val id = cc(b, p)
        val len = rd32(b, p + 4)
        if (len < 0 || p + 8 + len > e) walking = false // malformed — stop this level
        else {
          val next = p + 8 + len + (len & 1) // even padding
          if (id == "LIST" && len >= 4) {
            // descend depth-first: body first, then this level's remainder
            stack = (p + 12, p + 8 + len) :: (next, e) :: stack
            walking = false
          } else {
            if (id != "LIST") f(id, p + 8, len)
            p = next
          }
        }
      }
    }
  }

  private def decodeDib(b: Array[Byte], off: Int, len: Int,
                        w: Int, h: Int): Option[BufferedImage] = {
    val stride = (w * 3 + 3) & ~3
    if (len.toLong < stride.toLong * h) return None // long math: no overflow pass
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = off + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val bb = b(row + 3 * x) & 0xff
        val g = b(row + 3 * x + 1) & 0xff
        val r = b(row + 3 * x + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | bb)
        x += 1
      }
      y += 1
    }
    Some(img)
  }
}
