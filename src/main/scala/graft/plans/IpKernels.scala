package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** IPv6 text/binary kernels — pure string/byte math (no resolver, no
  * java.net.InetAddress, which would DNS-resolve hostnames). Parsing
  * accepts the RFC 4291 text forms (full groups, `::` compression,
  * embedded dotted-quad tail); formatting follows RFC 5952 (lowercase
  * hex, no leading zeros, longest ≥2 zero-run compressed, leftmost on
  * ties) with the IPv4-mapped `::ffff:a.b.c.d` special case — the
  * same convention ClickHouse's inet_ntop-based formatting uses.
  * Called via StaticInvoke (codegen'd straight calls). */
object IpKernels {

  /** 16 network-order bytes of an IPv6 literal, null when malformed. */
  def ipv6ToBytes(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString.trim
    if (str.isEmpty) return null
    // split an embedded dotted-quad tail first
    var hexPart = str
    var v4: Array[Int] = null
    if (str.contains('.')) {
      val lastColon = str.lastIndexOf(':')
      if (lastColon < 0) return null
      val dotted = str.substring(lastColon + 1)
      val quads = dotted.split("\\.", -1)
      if (quads.length != 4) return null
      v4 = new Array[Int](4)
      var i = 0
      while (i < 4) {
        val q = quads(i)
        if (q.isEmpty || q.length > 3 || !q.forall(_.isDigit)) return null
        v4(i) = q.toInt
        if (v4(i) > 255) return null
        i += 1
      }
      hexPart = str.substring(0, lastColon + 1) // keep the trailing ':'
    }
    val dcIdx = hexPart.indexOf("::")
    if (dcIdx != hexPart.lastIndexOf("::") && dcIdx >= 0) return null
    def parseGroups(part: String): Array[Int] =
      if (part.isEmpty) Array.emptyIntArray
      else {
        val gs = part.split(":", -1)
        val out = new Array[Int](gs.length)
        var i = 0
        while (i < gs.length) {
          val g = gs(i)
          if (g.isEmpty || g.length > 4 ||
              !g.forall(c => Character.digit(c, 16) >= 0)) return null
          out(i) = Integer.parseInt(g, 16)
          i += 1
        }
        out
      }
    val v4Groups = if (v4 == null) 0 else 2
    val groups: Array[Int] =
      if (dcIdx >= 0) {
        val leftS = hexPart.substring(0, dcIdx)
        var rightS = hexPart.substring(dcIdx + 2)
        if (rightS.endsWith(":")) rightS = rightS.dropRight(1)
        val left = parseGroups(leftS)
        val right = parseGroups(rightS)
        if (left == null || right == null) return null
        val given = left.length + right.length + v4Groups
        if (given > 7) return null // "::" must stand for ≥ 1 group
        left ++ Array.fill(8 - v4Groups - left.length - right.length)(0) ++ right
      } else {
        var p = hexPart
        if (v4 != null) { if (!p.endsWith(":")) return null; p = p.dropRight(1) }
        val g = parseGroups(p)
        if (g == null || g.length != 8 - v4Groups) return null
        g
      }
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8 - v4Groups) {
      out(2 * i) = ((groups(i) >> 8) & 0xFF).toByte
      out(2 * i + 1) = (groups(i) & 0xFF).toByte
      i += 1
    }
    if (v4 != null) {
      out(12) = v4(0).toByte; out(13) = v4(1).toByte
      out(14) = v4(2).toByte; out(15) = v4(3).toByte
    }
    out
  }

  /** RFC 5952 text of 16 address bytes; IPv4-mapped prints dotted. */
  def bytesToIpv6(b: Array[Byte]): UTF8String = {
    if (b == null || b.length != 16) return null
    var mapped = (b(10) & 0xFF) == 0xFF && (b(11) & 0xFF) == 0xFF
    var i = 0
    while (mapped && i < 10) { if (b(i) != 0) mapped = false; i += 1 }
    if (mapped)
      return UTF8String.fromString(
        s"::ffff:${b(12) & 0xFF}.${b(13) & 0xFF}.${b(14) & 0xFF}.${b(15) & 0xFF}")
    val g = new Array[Int](8)
    i = 0
    while (i < 8) { g(i) = ((b(2 * i) & 0xFF) << 8) | (b(2 * i + 1) & 0xFF); i += 1 }
    // longest run of zero groups, length ≥ 2, leftmost wins ties
    var bestStart = -1; var bestLen = 0
    var s = 0
    while (s < 8) {
      if (g(s) == 0) {
        var e = s
        while (e < 8 && g(e) == 0) e += 1
        if (e - s > bestLen) { bestStart = s; bestLen = e - s }
        s = e
      } else s += 1
    }
    if (bestLen < 2) { bestStart = -1; bestLen = 0 }
    val sb = new java.lang.StringBuilder(45)
    i = 0
    while (i < 8) {
      if (i == bestStart) {
        sb.append("::"); i += bestLen
      } else {
        if (i > 0 && sb.length > 0 && sb.charAt(sb.length - 1) != ':') sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(i)))
        i += 1
      }
    }
    if (sb.length == 0) sb.append("::")
    UTF8String.fromString(sb.toString)
  }

  /** ClickHouse cutIPv6: zero the trailing `cut4` bytes of an
    * IPv4-mapped address (resp. `cut6` of a native one), re-format. */
  def cutIPv6(b: Array[Byte], cut6: Int, cut4: Int): UTF8String = {
    if (b == null || b.length != 16) return null
    var mapped = (b(10) & 0xFF) == 0xFF && (b(11) & 0xFF) == 0xFF
    var i = 0
    while (mapped && i < 10) { if (b(i) != 0) mapped = false; i += 1 }
    val cut = math.min(if (mapped) cut4 else cut6, 16)
    val c = b.clone()
    i = 16 - cut
    while (i < 16) { c(i) = 0; i += 1 }
    bytesToIpv6(c)
  }

  /** `::ffff:a.b.c.d` bytes of an IPv4 numeric address. */
  def ipv4ToIpv6Bytes(ip: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    out(10) = 0xFF.toByte; out(11) = 0xFF.toByte
    out(12) = ((ip >> 24) & 0xFF).toByte; out(13) = ((ip >> 16) & 0xFF).toByte
    out(14) = ((ip >> 8) & 0xFF).toByte; out(15) = (ip & 0xFF).toByte
    out
  }

  /** toIPv6's text form: dotted-quad input maps, else parses as v6. */
  def toIpv6Bytes(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    if (str.nonEmpty && !str.contains(':') && str.contains('.')) {
      val quads = str.split("\\.", -1)
      if (quads.length != 4) return null
      var ip = 0L
      var i = 0
      while (i < 4) {
        val q = quads(i)
        if (q.isEmpty || q.length > 3 || !q.forall(_.isDigit) || q.toInt > 255) return null
        ip = (ip << 8) | q.toInt
        i += 1
      }
      ipv4ToIpv6Bytes(ip)
    } else ipv6ToBytes(s)
  }

  /** Lamping–Veach jump consistent hash — the published algorithm,
    * value-parity with ClickHouse's jumpConsistentHash. */
  def jumpConsistentHash(key: Long, buckets: Int): Int = {
    var k = key
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      k = k * 2862933555777941757L + 1
      j = ((b + 1) * (2147483648.0 / ((k >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }
}

/** String kernels with no compositional expression analog. */
object StrKernels {
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.util.regex.Pattern](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.util.regex.Pattern]): Boolean = size() > 64
      })

  /** replaceRegexpOne: first match only; $N group references follow
    * the same Java convention replaceRegexpAll (regexp_replace)
    * uses. */
  def replaceFirst(s: UTF8String, pat: UTF8String, repl: UTF8String): UTF8String = {
    if (s == null || pat == null || repl == null) return null
    val p = cache.computeIfAbsent(pat.toString, java.util.regex.Pattern.compile(_))
    UTF8String.fromString(p.matcher(s.toString).replaceFirst(repl.toString))
  }

  /** bin()'s inverse: bit text → the bytes it spells (left-padded to
    * whole octets, the CH convention); null on non-binary chars. */
  def unbin(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (!str.forall(c => c == '0' || c == '1')) return null
    val padded = "0" * ((8 - str.length % 8) % 8) + str
    val out = new Array[Byte](padded.length / 8)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(padded.substring(i * 8, i * 8 + 8), 2).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Byte-reinterpret kernels (little-endian, the CH convention). */
object ReinterpretKernels {
  /** First 8 bytes of the string as a little-endian unsigned int
    * (shorter strings zero-extend — CH semantics). */
  def stringToUInt64(s: UTF8String): Long = {
    if (s == null) return 0L
    val b = s.getBytes
    var v = 0L
    var i = math.min(b.length, 8) - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
    v
  }

  /** Little-endian bytes of the value with trailing zero bytes
    * stripped, read back as a string (CH reinterpretAsString). */
  def uint64ToString(v: Long): UTF8String = {
    var n = 8
    while (n > 0 && ((v >>> ((n - 1) * 8)) & 0xFF) == 0) n -= 1
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(i) = ((v >>> (i * 8)) & 0xFF).toByte; i += 1 }
    UTF8String.fromBytes(b)
  }
}
