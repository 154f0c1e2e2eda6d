package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels with VALUE-level ClickHouse parity where the
  * algorithm is public and byte-defined: xxHash64/xxHash32 (xxHash
  * spec, seed 0), crc32 (IEEE), crc64 (ECMA-182/XZ variant: reflected,
  * init/xorout all-ones), javaHash (String.hashCode), halfMD5 (first
  * 8 MD5 bytes, big-endian). Unlike the cityHash64-family aliases
  * (documented engine-internal remaps), these produce the same
  * numbers ClickHouse does for the same string, so persisted values
  * survive a migration. */
object HashKernelFns {

  def xxHash64(in: UTF8String): Long = {
    val b = in.getBytes
    XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0L)
  }

  private final val P32_1 = 0x9E3779B1
  private final val P32_2 = 0x85EBCA77
  private final val P32_3 = 0xC2B2AE3D
  private final val P32_4 = 0x27D4EB2F
  private final val P32_5 = 0x165667B1

  /** xxHash32, seed 0, over the UTF-8 bytes — returned in the
    * unsigned 32-bit range as a Long (CH's UInt32). */
  def xxHash32(in: UTF8String): Long = {
    val b = in.getBytes
    val len = b.length
    var i = 0
    var h: Int = 0
    if (len >= 16) {
      var v1 = P32_1 + P32_2
      var v2 = P32_2
      var v3 = 0
      var v4 = -P32_1
      while (i <= len - 16) {
        v1 = Integer.rotateLeft(v1 + readIntLE(b, i) * P32_2, 13) * P32_1
        v2 = Integer.rotateLeft(v2 + readIntLE(b, i + 4) * P32_2, 13) * P32_1
        v3 = Integer.rotateLeft(v3 + readIntLE(b, i + 8) * P32_2, 13) * P32_1
        v4 = Integer.rotateLeft(v4 + readIntLE(b, i + 12) * P32_2, 13) * P32_1
        i += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else {
      h = P32_5
    }
    h += len
    while (i <= len - 4) {
      h = Integer.rotateLeft(h + readIntLE(b, i) * P32_3, 17) * P32_4
      i += 4
    }
    while (i < len) {
      h = Integer.rotateLeft(h + (b(i) & 0xFF) * P32_5, 11) * P32_1
      i += 1
    }
    h ^= h >>> 15
    h *= P32_2
    h ^= h >>> 13
    h *= P32_3
    h ^= h >>> 16
    h & 0xFFFFFFFFL
  }

  private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  def crc32(in: UTF8String): Long = {
    val c = new java.util.zip.CRC32
    val b = in.getBytes
    c.update(b, 0, b.length)
    c.getValue
  }

  private final val Crc64Table: Array[Long] = {
    // CRC-64/XZ: reflected ECMA-182 polynomial
    val poly = 0xC96C5795D7870F42L // reflected 0x42F0E1EBA9EA3693
    val t = new Array[Long](256)
    var n = 0
    while (n < 256) {
      var c = n.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc64(in: UTF8String): Long = {
    val b = in.getBytes
    var crc = -1L
    var i = 0
    while (i < b.length) {
      crc = Crc64Table(((crc ^ b(i)) & 0xFF).toInt) ^ (crc >>> 8)
      i += 1
    }
    ~crc
  }

  def javaHash(in: UTF8String): Long = in.toString.hashCode.toLong

  /** The input bytes ARE UTF-16LE; hash the decoded string. */
  def javaHashUTF16LE(in: UTF8String): Long =
    new String(in.getBytes, java.nio.charset.StandardCharsets.UTF_16LE).hashCode.toLong

  def halfMD5(in: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(in.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h
  }

  // ---- SipHash-2-4 (Aumasson & Bernstein, public reference spec).
  // ClickHouse's sipHash64 is SipHash-2-4 with k0 = k1 = 0 over the
  // value bytes; the keyed core is kept general so the spec can pin
  // the paper's test vectors (key 000102…0f) and cross-check against
  // an independent implementation (Guava's sipHash24).

  def sipHash24(k0: Long, k1: Long, b: Array[Byte]): Long = {
    var v0 = k0 ^ 0x736f6d6570736575L
    var v1 = k1 ^ 0x646f72616e646f6dL
    var v2 = k0 ^ 0x6c7967656e657261L
    var v3 = k1 ^ 0x7465646279746573L
    val len = b.length
    @inline def round(): Unit = {
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0
      v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2
      v2 = java.lang.Long.rotateLeft(v2, 32)
    }
    var i = 0
    while (i + 8 <= len) {
      val m = readLongLE(b, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var last = (len.toLong & 0xFF) << 56
    var shift = 0
    while (i < len) { last |= (b(i) & 0xFFL) << shift; shift += 8; i += 1 }
    v3 ^= last; round(); round(); v0 ^= last
    v2 ^= 0xFF
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  def sipHash64(in: UTF8String): Long = sipHash24(0L, 0L, in.getBytes)

  /** ClickHouse's multi-argument combine for the sipHash64 family:
    * SipHash-2-4 over the 16 bytes of the two prior hashes (LE). */
  def sipCombine(h1: Long, h2: Long): Long = {
    val b = new Array[Byte](16)
    writeLongLE(b, 0, h1); writeLongLE(b, 8, h2)
    sipHash24(0L, 0L, b)
  }

  private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) | ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) | ((b(i + 7) & 0xFFL) << 56)

  private def writeLongLE(b: Array[Byte], i: Int, v: Long): Unit = {
    var k = 0
    while (k < 8) { b(i + k) = ((v >>> (8 * k)) & 0xFF).toByte; k += 1 }
  }

  // ---- CityHash64, Google CityHash VERSION 1.0.2 (the version
  // ClickHouse pinned before Google changed the algorithm in 1.1 —
  // CH docs call this out explicitly). Transcribed from the public
  // 1.0.2 source; all ops are 64-bit wrapping, rotations are RIGHT
  // rotations, fetches little-endian.

  private final val kc0 = 0xc3a5c85c97cb3127L
  private final val kc1 = 0xb492b66fbe98f273L
  private final val kc2 = 0x9ae16a3b2f90404fL
  private final val kc3 = 0xc949d7c7509e6557L
  private final val kMul = 0x9ddfea08eb382d69L

  @inline private def rotR(v: Long, s: Int): Long = java.lang.Long.rotateRight(v, s)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)
  @inline private def fetch32(b: Array[Byte], i: Int): Long = readIntLE(b, i) & 0xFFFFFFFFL

  private def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var r = (hi ^ a) * kMul
    r ^= (r >>> 47)
    r * kMul
  }

  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(b: Array[Byte], len: Int): Long =
    if (len > 8) {
      val a = readLongLE(b, 0)
      val b8 = readLongLE(b, len - 8)
      hashLen16(a, rotR(b8 + len, len)) ^ b8
    } else if (len >= 4) {
      val a = fetch32(b, 0)
      hashLen16(len + (a << 3), fetch32(b, len - 4))
    } else if (len > 0) {
      val a = b(0) & 0xFF
      val m = b(len >> 1) & 0xFF
      val c = b(len - 1) & 0xFF
      val y = (a + (m << 8)).toLong       // uint32
      val z = (len + (c << 2)).toLong     // uint32
      shiftMix(y * kc2 ^ z * kc3) * kc2
    } else kc2

  private def hashLen17to32(b: Array[Byte], len: Int): Long = {
    val a = readLongLE(b, 0) * kc1
    val b8 = readLongLE(b, 8)
    val c = readLongLE(b, len - 8) * kc2
    val d = readLongLE(b, len - 16) * kc0
    hashLen16(rotR(a - b8, 43) + rotR(c, 30) + d,
              a + rotR(b8 ^ kc3, 20) - c + len)
  }

  // (a+z, b+c) state mix over one 32-byte block — 1.0.2's
  // WeakHashLen32WithSeeds
  private def weakHash32(b: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = readLongLE(b, off)
    val x = readLongLE(b, off + 8)
    val y = readLongLE(b, off + 16)
    val z = readLongLE(b, off + 24)
    var a = a0 + w
    var bb = rotR(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    bb += rotR(a, 44)
    (a + z, bb + c)
  }

  private def hashLen33to64(b: Array[Byte], len: Int): Long = {
    var z = readLongLE(b, 24)
    var a = readLongLE(b, 0) + (len + readLongLE(b, len - 16)) * kc0
    var bb = rotR(a + z, 52)
    var c = rotR(a, 37)
    a += readLongLE(b, 8)
    c += rotR(a, 7)
    a += readLongLE(b, 16)
    val vf = a + z
    val vs = bb + rotR(a, 31) + c
    a = readLongLE(b, 16) + readLongLE(b, len - 32)
    z = readLongLE(b, len - 8)
    bb = rotR(a + z, 52)
    c = rotR(a, 37)
    a += readLongLE(b, len - 24)
    c += rotR(a, 7)
    a += readLongLE(b, len - 16)
    val wf = a + z
    val ws = bb + rotR(a, 31) + c
    val r = shiftMix((vf + ws) * kc2 + (wf + vs) * kc0)
    shiftMix(r * kc0 + vs) * kc2
  }

  def cityHash64Bytes(b: Array[Byte]): Long = {
    val len = b.length
    if (len <= 16) hashLen0to16(b, len)
    else if (len <= 32) hashLen17to32(b, len)
    else if (len <= 64) hashLen33to64(b, len)
    else {
      var s = 0
      var x = readLongLE(b, 0)
      var y = readLongLE(b, len - 16) ^ kc1
      var z = readLongLE(b, len - 56) ^ kc0
      var v = weakHash32(b, len - 64, len.toLong, y)
      var w = weakHash32(b, len - 32, len.toLong * kc1, kc0)
      z += shiftMix(v._2) * kc1
      x = rotR(z + x, 39) * kc1
      y = rotR(y, 33) * kc1
      var l = (len - 1) & ~63
      while (l != 0) {
        x = rotR(x + y + v._1 + readLongLE(b, s + 16), 37) * kc1
        y = rotR(y + v._2 + readLongLE(b, s + 48), 42) * kc1
        x ^= w._2
        y ^= v._1
        z = rotR(z ^ w._1, 33)
        v = weakHash32(b, s, v._2 * kc1, x + w._1)
        w = weakHash32(b, s + 32, z + w._2, y)
        val t = z; z = x; x = t
        s += 64
        l -= 64
      }
      hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * kc1 + z,
                hashLen16(v._2, w._2) + x)
    }
  }

  def cityHash64(in: UTF8String): Long = cityHash64Bytes(in.getBytes)

  /** ClickHouse's multi-argument combine for the cityHash64 family:
    * Hash128to64(uint128(h1, h2)). */
  def cityCombine(h1: Long, h2: Long): Long = hash128to64(h1, h2)

  def dispatch(kernel: String, in: UTF8String): Long = kernel match {
    case "xxHash64"        => xxHash64(in)
    case "xxHash32"        => xxHash32(in)
    case "crc32"           => crc32(in)
    case "crc64"           => crc64(in)
    case "javaHash"        => javaHash(in)
    case "javaHashUTF16LE" => javaHashUTF16LE(in)
    case "halfMD5"         => halfMD5(in)
    case "cityHash64"      => cityHash64(in)
    case "sipHash64"       => sipHash64(in)
    case other => throw new IllegalArgumentException(s"unknown hash kernel $other")
  }

  /** ClickHouse `intHash64`: the MurmurHash3 64-bit finalizer
    * (fmix64 — published constants 0xff51afd7ed558ccd /
    * 0xc4ceb9fe1a85ec53, shift 33), applied to the integer value.
    * A bijection on the 64-bit space (each step is invertible). */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def dispatchCombine(kernel: String, h1: Long, h2: Long): Long = kernel match {
    case "cityCombine" => cityCombine(h1, h2)
    case "sipCombine"  => sipCombine(h1, h2)
    case other => throw new IllegalArgumentException(s"unknown combine kernel $other")
  }
}

/** One codegen'd unary expression for the exact-parity hash family —
  * `kernel` picks the static method, the generated code is a direct
  * static call. */
case class HashKernelExpr(child: Expression, kernel: String) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = kernel
  override protected def nullSafeEval(input: Any): Any =
    HashKernelFns.dispatch(kernel, input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashKernelFns.$kernel($c)")
  override protected def withNewChildInternal(c: Expression): HashKernelExpr = copy(child = c)
}

/** `sipHash64Keyed((k0, k1), msg)` — the SipHash-2-4 kernel under a
  * caller-supplied 128-bit key; CH VALUE parity for string messages
  * (same kernel [[HashKernelFns.sipHash24]] the unkeyed spelling
  * uses with k0 = k1 = 0). */
case class SipHashKeyedExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sipHash64Keyed"
  override protected def nullSafeEval(k0: Any, k1: Any, msg: Any): Any =
    HashKernelFns.sipHash24(k0.asInstanceOf[Long], k1.asInstanceOf[Long],
      msg.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.plans.HashKernelFns.sipHash24($a, $b, $c.getBytes())")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): SipHashKeyedExpr =
    copy(first = a, second = b, third = c)
}

/** Codegen'd `intHash64` over a long input (see
  * [[HashKernelFns.intHash64]]). */
case class IntHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "intHash64"
  override protected def nullSafeEval(input: Any): Any =
    HashKernelFns.intHash64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashKernelFns.intHash64($c)")
  override protected def withNewChildInternal(c: Expression): IntHash64Expr = copy(child = c)
}

/** Codegen'd pairwise combine for the ClickHouse multi-argument hash
  * convention (`kernel` ∈ cityCombine | sipCombine). */
case class CombineHashExpr(left: Expression, right: Expression, kernel: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = kernel
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HashKernelFns.dispatchCombine(kernel, l.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.HashKernelFns.$kernel($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CombineHashExpr =
    copy(left = l, right = r)
}

/** ClickHouse cityHash64 / sipHash64 with VALUE parity for String /
  * FixedString arguments: each string argument goes through the real
  * kernel ([[HashKernelFns.cityHash64Bytes]] — CityHash v1.0.2, the
  * version CH pinned — or SipHash-2-4 key 0), and multiple arguments
  * fold left through CH's combine for that family. Non-string
  * arguments keep the documented engine-internal seeded-xxhash remap
  * (CH routes those through intHash transforms whose exact variants
  * aren't pinned here; a mixed call is deterministic within this
  * engine but not a CH byte replay — hash STRING keys for
  * cross-engine shard/sample reproducibility).
  *
  * RuntimeReplaceable so the per-argument type dispatch happens after
  * analysis resolves the children, not at function-registration time.
  */
case class ChWireHash(children: Seq[Expression], kernel: String, fallbackSeed: Long)
  extends Expression with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  import org.apache.spark.sql.types.{BinaryType, StringType}
  override def prettyName: String = kernel
  override lazy val replacement: Expression = {
    def one(e: Expression): Expression = e.dataType match {
      case _: StringType => HashKernelExpr(e, kernel)
      // binary → string is a zero-copy reinterpret; the kernel hashes
      // the same bytes
      case BinaryType => HashKernelExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(e, StringType), kernel)
      case _ => org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(e), fallbackSeed)
    }
    val combine = if (kernel == "cityHash64") "cityCombine" else "sipCombine"
    children.map(one).reduceLeft((a, b) => CombineHashExpr(a, b, combine))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
