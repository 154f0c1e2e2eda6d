package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_pack_ids(tokCounts, maxTokens)` → the greedy
  * sequence-packing assignment: walking the array in order, each
  * element joins the current pack while the running token total stays
  * within `maxTokens`, else opens the next pack (an element larger
  * than the budget gets a pack of its own). Returns the pack id per
  * position.
  *
  * Exists because the declarative formulation — a SQL `aggregate`
  * fold that APPENDS each element to an array accumulator — copies
  * the accumulator on every step: O(n²) per group, which turned the
  * packing query from 0.3 s at sf0.1 into 9 s at sf1 and would be
  * fatal at real scale. This kernel is the same sequential recurrence
  * in O(n); the group-sized array never gets copied. Interpreted eval
  * (CodegenFallback) is fine: one call per GROUP, a tight loop inside.
  */
case class PackIds(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) =>
      if (right.foldable && right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_pack_ids maxTokens must be a literal int")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_pack_ids requires array<bigint>/array<int> token counts")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pack_ids"

  private lazy val maxTokens = right.eval().asInstanceOf[Int].toLong
  private lazy val elemIsLong = left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override protected def nullSafeEval(toks: Any, max: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Int](n)
    var pack = 0
    var run = 0L
    var i = 0
    while (i < n) {
      val t = if (elemIsLong) arr.getLong(i) else arr.getInt(i).toLong
      if (run > 0 && run + t > maxTokens) { pack += 1; run = t }
      else run += t
      out(i) = pack
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackIds =
    copy(l, r)
}
