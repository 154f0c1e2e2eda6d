package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, FloatType}

/** bfloat16 truncation: keep the upper 16 bits of the IEEE-754
  * float32 pattern (sign + exponent + 7 mantissa bits), zero the
  * rest — the conversion ClickHouse's quantileBFloat16 applies to
  * every input before aggregating. Bit-exact (no log/pow numerics),
  * codegen'd to two intrinsics, handles ±0/±inf/subnormals by
  * construction; NaN stays NaN (payload truncated). */
case class Bfloat16Truncate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == FloatType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"toBFloat16 expects FLOAT input, got ${child.dataType.sql}")

  override def dataType: DataType = FloatType
  override def prettyName: String = "toBFloat16"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Float.intBitsToFloat(
      java.lang.Float.floatToRawIntBits(input.asInstanceOf[Float]) & 0xFFFF0000)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"java.lang.Float.intBitsToFloat(java.lang.Float.floatToRawIntBits($c) & 0xFFFF0000)")

  override protected def withNewChildInternal(newChild: Expression): Bfloat16Truncate =
    copy(child = newChild)
}
