package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subsequence / bit-slice / array-distance kernels behind the
  * ClickHouse string-search long tail: hasSubsequence (+case
  * variants), bitSlice, arrayLevenshteinDistance. Static methods so
  * the scalar expressions stay inside whole-stage codegen. Reference
  * surface: the scanner prompt's "string search" family
  * (/root/reference/src/prompts/scanner.py:18-35).
  */
object SequenceScanKernels {

  /** Greedy two-pointer subsequence test over UTF-16 code units
    * (needle's characters appear in haystack in order, gaps allowed).
    * The greedy scan is exact for subsequence testing. */
  def hasSubsequence(hay: UTF8String, needle: UTF8String): Boolean = {
    val h = hay.toString; val n = needle.toString
    if (n.isEmpty) return true
    var i = 0; var j = 0
    while (i < h.length && j < n.length) {
      if (h.charAt(i) == n.charAt(j)) j += 1
      i += 1
    }
    j == n.length
  }

  /** ClickHouse bitSlice: `offset` is 1-based in BITS (negative =
    * from the end), `length` optional (negative = stop |length| bits
    * before the end). The selected bits are repacked left-aligned
    * into a fresh byte string, last byte zero-padded. */
  def bitSlice(s: UTF8String, offset0: Long, length0: Long, hasLength: Boolean): Array[Byte] = {
    val bytes = s.getBytes
    val totalBits = bytes.length.toLong * 8
    var start = if (offset0 > 0) offset0 - 1 else totalBits + offset0
    if (start < 0) start = 0
    if (start >= totalBits) return Array.emptyByteArray
    val endExcl =
      if (!hasLength) totalBits
      else if (length0 >= 0) math.min(totalBits, start + length0)
      else math.max(start, totalBits + length0)
    val n = (endExcl - start).toInt
    if (n <= 0) return Array.emptyByteArray
    val out = new Array[Byte]((n + 7) / 8)
    var k = 0
    while (k < n) {
      val bitPos = start + k
      val bit = (bytes((bitPos / 8).toInt) >> (7 - (bitPos % 8).toInt)) & 1
      if (bit != 0) out(k / 8) = (out(k / 8) | (1 << (7 - k % 8))).toByte
      k += 1
    }
    out
  }

  /** Levenshtein distance between two arrays under element equality
    * (nulls equal to nulls only). One-row rolling DP — O(min) space. */
  def arrayLevenshtein(a: Array[AnyRef], b: Array[AnyRef]): Long = {
    def eq(x: AnyRef, y: AnyRef): Boolean = if (x == null) y == null else x.equals(y)
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(_.toLong)
    var curr = new Array[Long](s.length + 1)
    var j = 1
    while (j <= t.length) {
      curr(0) = j
      var i = 1
      while (i <= s.length) {
        val cost = if (eq(s(i - 1), t(j - 1))) 0L else 1L
        curr(i) = math.min(math.min(curr(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      j += 1
    }
    prev(s.length)
  }
}

case class HasSubsequence(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "hasSubsequence"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SequenceScanKernels.hasSubsequence(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SequenceScanKernels.hasSubsequence($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HasSubsequence =
    copy(left = l, right = r)
}

/** `bitSlice(s, offset[, length])`; the two-argument spelling passes
  * `length = Literal(0L), hasLength = false` from the dialect — the
  * length operand is ignored whenever `hasLength` is false. */
case class BitSlice(first: Expression, second: Expression, third: Expression,
                    hasLength: Boolean) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitSlice"
  override protected def nullSafeEval(s: Any, off: Any, len: Any): Any =
    SequenceScanKernels.bitSlice(s.asInstanceOf[UTF8String],
      off.asInstanceOf[Number].longValue(), len.asInstanceOf[Number].longValue(), hasLength)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, o, l) =>
      s"graft.plans.SequenceScanKernels.bitSlice($s, (long) $o, (long) $l, $hasLength)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): BitSlice =
    copy(first = a, second = b, third = c)
}

case class ArrayLevenshteinDistance(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "arrayLevenshteinDistance"
  private lazy val elemTypes: (DataType, DataType) = (
    left.dataType.asInstanceOf[ArrayType].elementType,
    right.dataType.asInstanceOf[ArrayType].elementType)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData].toObjectArray(elemTypes._1)
    val bb = b.asInstanceOf[ArrayData].toObjectArray(elemTypes._2)
    SequenceScanKernels.arrayLevenshtein(
      aa.asInstanceOf[Array[AnyRef]], bb.asInstanceOf[Array[AnyRef]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayLevenshteinDistance =
    copy(left = l, right = r)
}
