package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}
import scala.collection.mutable

/** ClickHouse `topK(k)(value)` as a native Catalyst aggregate: the k
  * most frequent values of `child`, ordered by (count desc, value asc)
  * — the deterministic tie-break that makes the result oracle-able.
  *
  * Exact variant: the buffer is a value→count map, merged across
  * partitions by summation (commutative + associative, so the result
  * is independent of partition count and merge order — unlike
  * ClickHouse's SpaceSaving sketch, which trades that determinism for
  * a hard memory bound). Memory is O(group cardinality); for
  * ultra-high-cardinality columns at 100 TB, pre-aggregate with
  * count/groupBy (one map-side-combined shuffle) and take the top k of
  * that instead — same cost envelope as this buffer would need.
  *
  * SQL surface: `topK(5)(user_id)` — the ClickHouse parametric
  * spelling — is rewritten by [[ChSqlParser]] to `topK(5, user_id)`
  * and resolved here via [[ChDialect]].
  */
case class GraftTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"topK k must be an integer literal, got $other")
  }

  override def left: Expression  = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topK k must be a foldable integer literal")
    } else if (kExpr.dataType != IntegerType && kExpr.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(s"topK k must be integral, got ${kExpr.dataType.sql}")
    } else if (!TypeUtils.typeWithProperEquals(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(s"topK does not support ${child.dataType.sql} values")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topK"

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty[AnyRef, Long]

  override def update(buffer: mutable.HashMap[AnyRef, Long], input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: eval over unsafe rows may return a reused buffer-backed value
      val key = InternalRow.copyValue(v).asInstanceOf[AnyRef]
      buffer.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[AnyRef, Long], other: mutable.HashMap[AnyRef, Long]): mutable.HashMap[AnyRef, Long] = {
    other.foreach { case (key, cnt) => buffer.updateWith(key) { c => Some(c.getOrElse(0L) + cnt) } }
    buffer
  }

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    val valueOrd = TypeUtils.getInterpretedOrdering(child.dataType)
    val entryOrd = new Ordering[(AnyRef, Long)] {
      override def compare(a: (AnyRef, Long), b: (AnyRef, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else valueOrd.compare(a._1.asInstanceOf[Any], b._1.asInstanceOf[Any])
      }
    }
    val top = buffer.toSeq.sorted(entryOrd).take(k).map(_._1)
    new GenericArrayData(top.toArray[Any])
  }

  // (value, count) rows through an UnsafeProjection — the standard
  // map-buffer wire format for typed imperative aggregates.
  private lazy val rowTypes: Array[DataType] = Array(child.dataType, LongType)

  override def serialize(buffer: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      val projection = UnsafeProjection.create(rowTypes)
      buffer.foreach { case (key, cnt) =>
        val unsafeRow = projection.apply(InternalRow.apply(key, cnt))
        out.writeInt(unsafeRow.getSizeInBytes)
        unsafeRow.writeToStream(out, scratch)
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally {
      out.close()
      bos.close()
    }
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[AnyRef, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val buffer = mutable.HashMap.empty[AnyRef, Long]
      val row = new UnsafeRow(2)
      var size = in.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        in.readFully(bs)
        row.pointTo(bs, size)
        val key = row.get(0, child.dataType).asInstanceOf[AnyRef]
        buffer.update(key, row.getLong(1))
        size = in.readInt()
      }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftTopK =
    copy(child = newLeft, kExpr = newRight)
}
