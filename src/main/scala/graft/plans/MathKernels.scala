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
