package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static kernels the codegen'd math expressions call into. */
object MathKernels {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)

  // ------------------------------------------------------------------
  // Space-filling curves (ClickHouse mortonEncode/mortonDecode,
  // hilbertEncode/hilbertDecode — public specs; the CH doc examples
  // mortonEncode(1,2,3)=53 and hilbertEncode(3,4)=31 are spec-pinned).

  /** Z-order interleave: bit j of argument i lands at position
    * j*n + i (first argument at the least-significant offset —
    * reproduces CH's documented mortonEncode(1,2,3) = 53). Each value
    * must fit 64/n bits, CH's own bound. */
  def mortonEncode(vals: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = vals.numElements()
    require(n >= 1 && n <= 8, s"mortonEncode takes 1-8 arguments, got $n")
    val budget = 64 / n
    var r = 0L
    var i = 0
    while (i < n) {
      val v = vals.getLong(i)
      if (v < 0 || (budget < 64 && (v >>> budget) != 0)) throw new IllegalArgumentException(
        s"mortonEncode: argument ${i + 1} ($v) does not fit $budget bits (64/$n)")
      var j = 0
      while (j < 64 && (v >>> j) != 0) {
        if (((v >>> j) & 1L) == 1L) r |= 1L << (j * n + i)
        j += 1
      }
      i += 1
    }
    r
  }

  /** Inverse of [[mortonEncode]]: component `i` of an n-dim code. */
  def mortonComponent(n: Int, i: Int, code: Long): Long = {
    var v = 0L
    var j = 0
    while (j * n + i < 64) {
      if (((code >>> (j * n + i)) & 1L) == 1L) v |= 1L << j
      j += 1
    }
    v
  }

  /** Hilbert index of a 2-D point over 32-bit coordinates (order-32
    * curve, the iterative rotate-and-accumulate construction). CH's
    * argument convention at this order is the transpose of the
    * textbook x/y — encode(3, 4) = 31 like the CH docs — so the
    * dialect passes (second, first). */
  def hilbertXY2D(x0: Long, y0: Long): Long = {
    require((x0 >>> 32) == 0 && (y0 >>> 32) == 0 && x0 >= 0 && y0 >= 0,
      s"hilbertEncode: coordinates must fit 32 bits, got ($x0, $y0)")
    var x = x0; var y = y0
    var d = 0L
    var s = 1L << 31
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[hilbertXY2D]]: component 0 = x, 1 = y. */
  def hilbertD2XY(component: Int, code: Long): Long = {
    var d = code
    var x = 0L; var y = 0L
    var s = 1L
    while (s != 0 && (s & 0xFFFFFFFFL) != 0) { // 32 levels
      val rx = 1L & (d >>> 1)
      val ry = 1L & (d ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d >>>= 2
      s <<= 1
    }
    if (component == 0) x else y
  }
}

/** `gcd(a, b)` / `lcm(a, b)` — ClickHouse's integer helpers (no
  * Spark builtin); interpreted eval + a straight static call under
  * whole-stage codegen. */
case class GcdExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MathKernels.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MathKernels.gcd($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdExpr =
    copy(left = l, right = r)
}

case class LcmExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MathKernels.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MathKernels.lcm($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcmExpr =
    copy(left = l, right = r)
}
