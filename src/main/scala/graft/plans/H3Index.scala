package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** H3 cell-index math (h3GetResolution / h3IsValid / h3ToParent /
  * h3ToChildren / stringToH3 / h3ToString) over the PUBLIC H3 index
  * bit layout — pure integer manipulation, no geographic projection.
  *
  * The geo↔cell conversions (geoToH3 / h3ToGeo / kRing / …) need the
  * icosahedral gnomonic projection of the native library and stay
  * refused in [[ChDialect]]; these six operate on indexes produced
  * ELSEWHERE (the common analytics shape: events arrive already keyed
  * by an H3 cell and queries roll them up to coarser resolutions with
  * h3ToParent). Reference surface: the scanner prompt's geo family
  * (/root/reference/src/prompts/scanner.py:18-35).
  *
  * Cell-mode layout (H3 spec, public): bit 63 reserved (0), bits
  * 59–62 mode (1 = cell), bits 56–58 reserved (0), bits 52–55
  * resolution, bits 45–51 base cell (0–121), then 15 three-bit
  * digits, digit for resolution r at bits (45−3r)..(47−3r); digits
  * past the cell's resolution hold 7 (unused marker). Verified
  * against the library's documented example cell
  * 0x8928308280fffff (res 9) → parent(8) = 0x8828308281fffff.
  *
  * All kernels are static methods so whole-stage codegen calls them
  * directly.
  */
object H3Kernels {

  /** Base-cell numbers whose home cell is a pentagon (public spec). */
  private val PentagonBases: Set[Int] =
    Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  def resolution(h: Long): Int = ((h >>> 52) & 0xF).toInt

  private def mode(h: Long): Int = ((h >>> 59) & 0xF).toInt

  private def baseCell(h: Long): Int = ((h >>> 45) & 0x7F).toInt

  /** The 3-bit digit for resolution r (1-based). */
  def digit(h: Long, r: Int): Int = ((h >>> (45 - 3 * r)) & 0x7).toInt

  private def withDigit(h: Long, r: Int, d: Int): Long = {
    val shift = 45 - 3 * r
    (h & ~(0x7L << shift)) | (d.toLong << shift)
  }

  /** Structural validity: cell mode, reserved bits clear, base cell
    * in range, used digits ≤ 6, unused digits = 7, and the pentagon
    * deleted-subsequence rule (in a pentagon base cell the first
    * nonzero digit cannot be the K axis, 1). */
  def isValid(h: Long): Boolean = {
    if (h < 0) return false                  // bit 63 reserved
    if (mode(h) != 1) return false
    if (((h >>> 56) & 0x7L) != 0L) return false
    val bc = baseCell(h)
    if (bc > 121) return false
    val res = resolution(h)
    var r = 1
    var firstNonZero = 0
    while (r <= res) {
      val d = digit(h, r)
      if (d > 6) return false
      if (d != 0 && firstNonZero == 0) firstNonZero = d
      r += 1
    }
    while (r <= 15) {
      if (digit(h, r) != 7) return false
      r += 1
    }
    !(PentagonBases.contains(bc) && firstNonZero == 1)
  }

  /** True when the cell itself is a pentagon (pentagon base cell and
    * all used digits 0 — every coarsening of a pentagon center). */
  def isPentagon(h: Long): Boolean = {
    if (!PentagonBases.contains(baseCell(h))) return false
    val res = resolution(h)
    var r = 1
    while (r <= res) {
      if (digit(h, r) != 0) return false
      r += 1
    }
    true
  }

  /** Coarsen to `parentRes`: truncate the digit path and restamp the
    * resolution. Errors on an invalid index or a parentRes finer than
    * the cell's own (ClickHouse throws there too). */
  def toParent(h: Long, parentRes: Int): Long = {
    val res = resolution(h)
    require(parentRes >= 0 && parentRes <= res,
      s"h3ToParent: parent resolution $parentRes must be in [0, $res]")
    var out = (h & ~(0xFL << 52)) | (parentRes.toLong << 52)
    var r = parentRes + 1
    while (r <= res) {
      out = withDigit(out, r, 7)
      r += 1
    }
    out
  }

  /** All children at `childRes` (≥ the cell's resolution), in index
    * order. A hexagon has 7^Δ children; pentagon centers skip the
    * deleted K-axis digit at each pentagon level, so a pentagon has
    * 6·7^(Δ−1)−…  (exactly the library's cellToChildren count). */
  def toChildren(h: Long, childRes: Int): Array[Long] = {
    val res = resolution(h)
    require(childRes >= res && childRes <= 15,
      s"h3ToChildren: child resolution $childRes must be in [$res, 15]")
    if (childRes == res) return Array(h)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    def expand(cell: Long, r: Int): Unit = {
      if (r > childRes) { out += cell; return }
      val stamped = (cell & ~(0xFL << 52)) | (r.toLong << 52)
      val pent = isPentagon(cell)
      var d = 0
      while (d <= 6) {
        if (!(pent && d == 1)) expand(withDigit(stamped, r, d), r + 1)
        d += 1
      }
    }
    expand(h, res + 1)
    out.toArray
  }

  /** Hex text → index; 0 for unparseable text (ClickHouse's
    * stringToH3 contract). */
  def fromString(s: UTF8String): Long =
    try java.lang.Long.parseUnsignedLong(s.toString.trim, 16)
    catch { case _: NumberFormatException => 0L }

  def toHexString(h: Long): UTF8String =
    UTF8String.fromString(java.lang.Long.toHexString(h))
}

case class H3GetResolution(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "h3GetResolution"
  override protected def nullSafeEval(input: Any): Any =
    H3Kernels.resolution(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Kernels.resolution($c)")
  override protected def withNewChildInternal(c: Expression): H3GetResolution = copy(child = c)
}

case class H3IsValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3IsValid"
  override protected def nullSafeEval(input: Any): Any =
    H3Kernels.isValid(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Kernels.isValid($c)")
  override protected def withNewChildInternal(c: Expression): H3IsValid = copy(child = c)
}

case class H3IsPentagon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "h3IsPentagon"
  override protected def nullSafeEval(input: Any): Any =
    H3Kernels.isPentagon(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Kernels.isPentagon($c)")
  override protected def withNewChildInternal(c: Expression): H3IsPentagon = copy(child = c)
}

case class H3ToParent(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "h3ToParent"
  override protected def nullSafeEval(h: Any, r: Any): Any =
    H3Kernels.toParent(h.asInstanceOf[Long], r.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, r) => s"graft.plans.H3Kernels.toParent($h, (int) $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): H3ToParent =
    copy(left = l, right = r)
}

case class H3ToChildren(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "h3ToChildren"
  override protected def nullSafeEval(h: Any, r: Any): Any = {
    val kids = H3Kernels.toChildren(h.asInstanceOf[Long], r.asInstanceOf[Number].intValue())
    new GenericArrayData(kids)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, r) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.H3Kernels.toChildren($h, (int) $r))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): H3ToChildren =
    copy(left = l, right = r)
}

case class StringToH3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "stringToH3"
  override protected def nullSafeEval(input: Any): Any =
    H3Kernels.fromString(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Kernels.fromString($c)")
  override protected def withNewChildInternal(c: Expression): StringToH3 = copy(child = c)
}

case class H3ToString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "h3ToString"
  override protected def nullSafeEval(input: Any): Any =
    H3Kernels.toHexString(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H3Kernels.toHexString($c)")
  override protected def withNewChildInternal(c: Expression): H3ToString = copy(child = c)
}
