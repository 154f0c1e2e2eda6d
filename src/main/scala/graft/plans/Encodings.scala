package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static codec kernels behind the ClickHouse encoding long tail:
  * base58 (Bitcoin alphabet), URL-safe base64, raw punycode
  * (RFC 3492) and IDNA domain encoding. Each is exposed through
  * [[StringCodec]], a single codegen'd unary expression that
  * dispatches to the named static kernel — one JVM static call per
  * row, inside the whole-stage span. */
object EncodingKernels {

  private final val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private final val B58Index: Array[Int] = {
    val m = Array.fill(128)(-1)
    var i = 0
    while (i < B58.length) { m(B58.charAt(i)) = i; i += 1 }
    m
  }

  def base58Encode(in: UTF8String): UTF8String = {
    val bytes = in.getBytes
    if (bytes.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    // repeated divmod 58 over a working copy (big-endian base-256)
    val work = java.util.Arrays.copyOf(bytes, bytes.length)
    val out = new java.lang.StringBuilder
    var start = zeros
    while (start < work.length) {
      var rem = 0
      var i = start
      while (i < work.length) {
        val acc = (rem << 8) | (work(i) & 0xFF)
        work(i) = (acc / 58).toByte
        rem = acc % 58
        i += 1
      }
      out.append(B58.charAt(rem))
      if (work(start) == 0) start += 1
    }
    var z = 0
    while (z < zeros) { out.append('1'); z += 1 }
    UTF8String.fromString(out.reverse.toString)
  }

  /** Strict decode: throws on a non-alphabet character (CH's
    * base58Decode contract; tryBase58Decode maps failure to ''). */
  def base58Decode(in: UTF8String): UTF8String = {
    val s = in.toString
    if (s.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < s.length && s.charAt(zeros) == '1') zeros += 1
    val digits = new Array[Int](s.length - zeros)
    var i = zeros
    while (i < s.length) {
      val c = s.charAt(i)
      val d = if (c < 128) B58Index(c) else -1
      if (d < 0) throw new IllegalArgumentException(
        s"base58Decode: invalid character '$c'")
      digits(i - zeros) = d
      i += 1
    }
    // base-58 → base-256, little-endian accumulation
    val buf = new java.util.ArrayList[Byte]
    for (d <- digits) {
      var carry = d
      var j = 0
      while (j < buf.size) {
        val acc = (buf.get(j) & 0xFF) * 58 + carry
        buf.set(j, (acc & 0xFF).toByte)
        carry = acc >> 8
        j += 1
      }
      while (carry > 0) { buf.add((carry & 0xFF).toByte); carry >>= 8 }
    }
    val out = new Array[Byte](zeros + buf.size)
    var k = 0
    while (k < buf.size) { out(zeros + k) = buf.get(buf.size - 1 - k); k += 1 }
    UTF8String.fromBytes(out)
  }

  def tryBase58Decode(in: UTF8String): UTF8String =
    try base58Decode(in) catch { case _: IllegalArgumentException => UTF8String.fromString("") }

  def base64UrlEncode(in: UTF8String): UTF8String =
    UTF8String.fromString(
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(in.getBytes))

  def base64UrlDecode(in: UTF8String): UTF8String =
    UTF8String.fromBytes(java.util.Base64.getUrlDecoder.decode(in.toString))

  def tryBase64UrlDecode(in: UTF8String): UTF8String =
    try base64UrlDecode(in) catch { case _: IllegalArgumentException => UTF8String.fromString("") }

  // -- raw punycode, RFC 3492 (single label, no xn-- prefix)

  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew))
  }

  private def digitToChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def charToDigit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else throw new IllegalArgumentException(s"punycode: invalid digit '$c'")

  def punycodeEncode(in: UTF8String): UTF8String = {
    val input = in.toString.codePoints().toArray
    val out = new java.lang.StringBuilder
    var basicCount = 0
    for (cp <- input) if (cp < 128) { out.append(cp.toChar); basicCount += 1 }
    val handled0 = basicCount
    if (basicCount > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    var handled = handled0
    while (handled < input.length) {
      var m = Int.MaxValue
      for (cp <- input) if (cp >= n && cp < m) m = cp
      delta += (m - n) * (handled + 1)
      n = m
      for (cp <- input) {
        if (cp < n) delta += 1
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) { out.append(digitToChar(q)); done = true }
            else {
              out.append(digitToChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          bias = adapt(delta, handled + 1, handled == handled0)
          delta = 0
          handled += 1
        }
      }
      delta += 1
      n += 1
    }
    UTF8String.fromString(out.toString)
  }

  def punycodeDecode(in: UTF8String): UTF8String = {
    val s = in.toString
    val lastDash = s.lastIndexOf('-')
    val output = new java.util.ArrayList[Integer]
    var i = 0
    if (lastDash > 0) {
      while (i < lastDash) {
        val c = s.charAt(i)
        if (c >= 128) throw new IllegalArgumentException("punycode: non-basic code point")
        output.add(c.toInt)
        i += 1
      }
      i = lastDash + 1
    } else i = if (lastDash == 0) 1 else 0
    var n = InitialN
    var idx = 0
    var bias = InitialBias
    while (i < s.length) {
      val oldi = idx
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (i >= s.length) throw new IllegalArgumentException("punycode: truncated input")
        val digit = charToDigit(s.charAt(i))
        i += 1
        idx += digit * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else { w *= Base - t; k += Base }
      }
      bias = adapt(idx - oldi, output.size + 1, oldi == 0)
      n += idx / (output.size + 1)
      idx %= output.size + 1
      output.add(idx, n)
      idx += 1
    }
    val sb = new java.lang.StringBuilder
    output.forEach(cp => sb.appendCodePoint(cp))
    UTF8String.fromString(sb.toString)
  }

  def tryPunycodeDecode(in: UTF8String): UTF8String =
    try punycodeDecode(in) catch { case _: IllegalArgumentException => UTF8String.fromString("") }

  /** Whole-domain IDNA (xn-- labels) on the JDK's RFC 3490 engine. */
  def idnaEncode(in: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toASCII(in.toString))

  def tryIdnaEncode(in: UTF8String): UTF8String =
    try idnaEncode(in) catch { case _: RuntimeException => UTF8String.fromString("") }

  def idnaDecode(in: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toUnicode(in.toString))

  private val Base32Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 (the CH base32Encode/base32Decode pair): 5-byte
    * groups → 8 chars, '=' padding, strict decode. */
  def base32Encode(in: UTF8String): UTF8String = {
    val bytes = in.getBytes
    val sb = new java.lang.StringBuilder((bytes.length + 4) / 5 * 8)
    var i = 0
    while (i < bytes.length) {
      val n = math.min(5, bytes.length - i)
      var acc = 0L
      var k = 0
      while (k < 5) { acc = (acc << 8) | (if (k < n) bytes(i + k) & 0xffL else 0L); k += 1 }
      val outChars = n match { case 1 => 2; case 2 => 4; case 3 => 5; case 4 => 7; case _ => 8 }
      var c = 0
      while (c < 8) {
        sb.append(if (c < outChars) Base32Alphabet.charAt(((acc >>> (35 - 5 * c)) & 31L).toInt) else '=')
        c += 1
      }
      i += 5
    }
    UTF8String.fromString(sb.toString)
  }

  def base32Decode(in: UTF8String): UTF8String = {
    val s = in.toString
    require(s.length % 8 == 0, s"base32Decode: length ${s.length} is not a multiple of 8")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var seenPad = false // '=' may appear only in the final group
    while (i < s.length) {
      var acc = 0L
      var pad = 0
      var k = 0
      while (k < 8) {
        val ch = s.charAt(i + k)
        if (ch == '=') { pad += 1; seenPad = true; acc <<= 5 }
        else {
          require(pad == 0 && !seenPad, "base32Decode: data after padding")
          val v = Base32Alphabet.indexOf(ch.toUpper)
          require(v >= 0, s"base32Decode: invalid character '$ch'")
          acc = (acc << 5) | v
        }
        k += 1
      }
      val nBytes = pad match { case 0 => 5; case 1 => 4; case 3 => 3; case 4 => 2; case 6 => 1
        case p => throw new IllegalArgumentException(s"base32Decode: invalid padding length $p") }
      var b = 0
      while (b < nBytes) { out.write(((acc >>> (32 - 8 * b)) & 0xffL).toInt); b += 1 }
      i += 8
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  def tryBase32Decode(in: UTF8String): UTF8String =
    try base32Decode(in) catch { case _: IllegalArgumentException => UTF8String.fromString("") }

  /** SHA-512/256 (FIPS 180-4 truncated variant — a JDK-native digest;
    * NOT a 256-bit prefix of SHA-512: different IVs). Hex output, the
    * same surface convention as the Sha2-backed SHA256 here. */
  def sha512_256(in: UTF8String): UTF8String = {
    val d = java.security.MessageDigest.getInstance("SHA-512/256").digest(in.getBytes)
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  def dispatch(kernel: String, in: UTF8String): UTF8String = kernel match {
    case "base58Encode"       => base58Encode(in)
    case "base58Decode"       => base58Decode(in)
    case "tryBase58Decode"    => tryBase58Decode(in)
    case "base32Encode"       => base32Encode(in)
    case "base32Decode"       => base32Decode(in)
    case "tryBase32Decode"    => tryBase32Decode(in)
    case "sha512_256"         => sha512_256(in)
    case "base64UrlEncode"    => base64UrlEncode(in)
    case "base64UrlDecode"    => base64UrlDecode(in)
    case "tryBase64UrlDecode" => tryBase64UrlDecode(in)
    case "punycodeEncode"     => punycodeEncode(in)
    case "punycodeDecode"     => punycodeDecode(in)
    case "tryPunycodeDecode"  => tryPunycodeDecode(in)
    case "idnaEncode"         => idnaEncode(in)
    case "tryIdnaEncode"      => tryIdnaEncode(in)
    case "idnaDecode"         => idnaDecode(in)
    case other => throw new IllegalArgumentException(s"unknown codec kernel $other")
  }
}

/** One expression for the whole codec family: `kernel` names the
  * static method, codegen emits the direct static call. */
case class StringCodec(child: Expression, kernel: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = kernel
  override protected def nullSafeEval(input: Any): Any =
    EncodingKernels.dispatch(kernel, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.EncodingKernels.$kernel($c)")
  override protected def withNewChildInternal(c: Expression): StringCodec = copy(child = c)
}
