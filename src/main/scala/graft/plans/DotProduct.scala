package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` / `array<double>`
  * columns, in double precision, accumulated sequentially left-to-
  * right (same precision contract as the declarative
  * `aggregate(zip_with(...))` formulation in [[graft.functions.vec]],
  * so results — and the DuckDB oracles — are unchanged).
  *
  * Exists because Catalyst's higher-order functions (`zip_with`,
  * `aggregate`) don't participate in whole-stage codegen and allocate
  * an intermediate array per row-pair — at 2M candidate pairs × 64
  * dims that interpretation overhead dominates the ANN hot loop.
  * This expression generates a tight primitive loop instead
  * (~10× on the brute-force/near-dup scoring paths).
  *
  * Null elements contribute 0; mismatched lengths score the common
  * prefix (embedding dims are a data contract upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires numeric array arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def reader(e: Expression): (ArrayData, Int) => Double = elemType(e) match {
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case ShortType   => (a, i) => a.getShort(i).toDouble
    case ByteType    => (a, i) => a.getByte(i).toDouble
    case d: DecimalType => (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lr, rr) = (reader(left), reader(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += lr(x, i) * rr(y, i)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(e: Expression, v: String, i: String): String = elemType(e) match {
      case FloatType   => s"(double)$v.getFloat($i)"
      case DoubleType  => s"$v.getDouble($i)"
      case IntegerType => s"(double)$v.getInt($i)"
      case LongType    => s"(double)$v.getLong($i)"
      case ShortType   => s"(double)$v.getShort($i)"
      case ByteType    => s"(double)$v.getByte($i)"
      case d: DecimalType => s"$v.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${get(left, a, i)} * ${get(right, b, i)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
