package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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

  def dispatch(kernel: String, in: UTF8String): Long = kernel match {
    case "xxHash64"        => xxHash64(in)
    case "xxHash32"        => xxHash32(in)
    case "crc32"           => crc32(in)
    case "crc64"           => crc64(in)
    case "javaHash"        => javaHash(in)
    case "javaHashUTF16LE" => javaHashUTF16LE(in)
    case "halfMD5"         => halfMD5(in)
    case other => throw new IllegalArgumentException(s"unknown hash kernel $other")
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
