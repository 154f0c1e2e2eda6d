package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** ClickHouse's `sumMap` / `maxMap` / `minMap`: element-wise combine of
  * parallel (keys, values) arrays across rows, keyed by key. The result
  * is a struct of (sorted keys, combined values) — ClickHouse's tuple
  * of two arrays, which is the monitoring-workload idiom for "a sparse
  * counter map per row, totalled per group".
  *
  * Buffer is a key→value map; merge is the same combine applied
  * map-wise, so the aggregate is commutative/associative and partial
  * aggregation (map-side combine) applies — per-group state is bounded
  * by distinct-key count, the same envelope ClickHouse's
  * AggregateFunctionSumMap carries. Integral value columns combine in
  * Long arithmetic (no double rounding); fractional in Double.
  */
case class GraftMapAgg(
    keysExpr: Expression,
    valuesExpr: Expression,
    op: String, // "sum" | "max" | "min"
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Any]] with BinaryLike[Expression] {

  override def left: Expression  = keysExpr
  override def right: Expression = valuesExpr

  private def keyType: DataType = keysExpr.dataType.asInstanceOf[ArrayType].elementType
  private def valueType: DataType = valuesExpr.dataType.asInstanceOf[ArrayType].elementType
  private def integral: Boolean = valueType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (keysExpr.dataType, valuesExpr.dataType) match {
    case (ArrayType(kt, _), ArrayType(vt, _)) =>
      if (!TypeUtils.typeWithProperEquals(kt))
        TypeCheckResult.TypeCheckFailure(s"${op}Map does not support ${kt.sql} keys")
      else if (!vt.isInstanceOf[NumericType])
        TypeCheckResult.TypeCheckFailure(s"${op}Map needs numeric values, got ${vt.sql}")
      else TypeCheckResult.TypeCheckSuccess
    case (k, v) =>
      TypeCheckResult.TypeCheckFailure(s"${op}Map takes (array keys, array values), got (${k.sql}, ${v.sql})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyType, containsNull = false), nullable = false),
    StructField("vals", ArrayType(if (integral) LongType else DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = s"${op}Map"

  private def combine(a: Any, b: Any): Any =
    if (integral) {
      val (x, y) = (a.asInstanceOf[Long], b.asInstanceOf[Long])
      op match { case "sum" => x + y; case "max" => math.max(x, y); case "min" => math.min(x, y) }
    } else {
      val (x, y) = (a.asInstanceOf[Double], b.asInstanceOf[Double])
      op match { case "sum" => x + y; case "max" => math.max(x, y); case "min" => math.min(x, y) }
    }

  private def widen(v: Any): Any =
    if (integral) v match {
      case b: Byte => b.toLong; case s: Short => s.toLong; case i: Int => i.toLong; case l: Long => l
    } else v match {
      case f: Float => f.toDouble; case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Any] = mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[AnyRef, Any], input: InternalRow): mutable.HashMap[AnyRef, Any] = {
    val keys = keysExpr.eval(input).asInstanceOf[ArrayData]
    val vals = valuesExpr.eval(input).asInstanceOf[ArrayData]
    if (keys != null && vals != null) {
      require(keys.numElements() == vals.numElements(),
        s"${op}Map: keys/values arrays differ in length (${keys.numElements()} vs ${vals.numElements()})")
      var i = 0
      while (i < keys.numElements()) {
        if (!keys.isNullAt(i) && !vals.isNullAt(i)) {
          val k = InternalRow.copyValue(keys.get(i, keyType)).asInstanceOf[AnyRef]
          val v = widen(vals.get(i, valueType))
          buffer.updateWith(k) { c => Some(c.fold(v)(combine(_, v))) }
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[AnyRef, Any], other: mutable.HashMap[AnyRef, Any]): mutable.HashMap[AnyRef, Any] = {
    other.foreach { case (k, v) => buffer.updateWith(k) { c => Some(c.fold(v)(combine(_, v))) } }
    buffer
  }

  override def eval(buffer: mutable.HashMap[AnyRef, Any]): Any = {
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val entries = buffer.toArray.sortWith((a, b) => keyOrd.compare(a._1, b._1) < 0)
    InternalRow(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2)))
  }

  private lazy val rowTypes: Array[DataType] =
    Array(keyType, if (integral) LongType else DoubleType)

  override def serialize(buffer: mutable.HashMap[AnyRef, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      val projection = UnsafeProjection.create(rowTypes)
      buffer.foreach { case (k, v) =>
        val row = projection.apply(InternalRow(k, v))
        out.writeInt(row.getSizeInBytes)
        row.writeToStream(out, scratch)
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[AnyRef, Any] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val buffer = mutable.HashMap.empty[AnyRef, Any]
      val row = new UnsafeRow(2)
      var size = in.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        in.readFully(bs)
        row.pointTo(bs, size)
        val k = row.get(0, keyType).asInstanceOf[AnyRef]
        // Box each branch explicitly: a bare `if (integral) getLong else
        // getDouble` unifies both branches to Double and silently widens
        // the Long path.
        val v: Any =
          if (integral) java.lang.Long.valueOf(row.getLong(1))
          else java.lang.Double.valueOf(row.getDouble(1))
        buffer.update(k, v)
        size = in.readInt()
      }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftMapAgg =
    copy(keysExpr = newLeft, valuesExpr = newRight)
}
