package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `multiplyDecimal` / `divideDecimal` kernel with ClickHouse's exact
  * semantics, which Spark's decimal operators can't express
  * (reference surface: the CH decimal-arithmetic functions the corpus
  * SQL may emit):
  *
  *  - the result is TRUNCATED (digits discarded, toward zero) at the
  *    requested scale — Spark's decimal Cast rounds HALF_UP
  *    (divideDecimal(2, 3, 1) is 0.6 in CH, a rounding cast says 0.7);
  *  - division computes at full requested scale — routing through
  *    Spark's Divide applies its precision-loss rules, which cap the
  *    intermediate scale near 6 and zero-pad any higher requested
  *    scale (divideDecimal(1, 3, 10) must be 0.3333333333, not
  *    0.3333330000);
  *  - division by zero throws (CH and the DuckDB oracle both do);
  *  - a result that can't fit Spark's Decimal(38) precision throws
  *    loudly (CH computes in Decimal256; 38 digits is the engine's
  *    documented bound — silent null would corrupt aggregates).
  *
  * Exact BigDecimal eval, CodegenFallback: scalar decimal arithmetic,
  * not a 100 TB hot path.
  */
case class DecimalOpTrunc(left: Expression, right: Expression,
                          resultScale: Int, isMultiply: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[DecimalType] || !right.dataType.isInstanceOf[DecimalType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires decimal arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
    else if (resultScale < 0 || resultScale > 38)
      TypeCheckResult.TypeCheckFailure(s"$prettyName result scale must be in [0, 38], got $resultScale")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DecimalType(38, resultScale)
  override def prettyName: String = if (isMultiply) "multiplyDecimal" else "divideDecimal"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
    val y = b.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
    val r: JBigDecimal =
      if (isMultiply) x.multiply(y).setScale(resultScale, RoundingMode.DOWN)
      else {
        if (y.signum() == 0)
          throw new ArithmeticException("divideDecimal: division by zero")
        // divide directly at the target scale with DOWN = truncation
        // toward zero of the exact quotient
        x.divide(y, resultScale, RoundingMode.DOWN)
      }
    val d = org.apache.spark.sql.types.Decimal(r)
    if (!d.changePrecision(38, resultScale))
      throw new ArithmeticException(
        s"$prettyName: result $r overflows Decimal(38, $resultScale) — " +
          "38 digits is this engine's decimal bound (CH Decimal256 values past it are unsupported)")
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalOpTrunc =
    copy(left = newLeft, right = newRight)
}
