package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import scala.collection.mutable

/** ClickHouse `groupArraySorted(n)(x)`: the n smallest values of the
  * group in ascending order — as a BOUNDED-heap native aggregate.
  *
  * The round-9..16 implementation was `slice(sort_array(collect_list))`,
  * which is correct but collects the WHOLE group into the buffer before
  * slicing: O(group size) memory and a full per-group sort. This
  * aggregate keeps a size-capped max-heap instead — each map task's
  * buffer holds ≤ n values per group, partial aggregation ships
  * `groups × n` values across the shuffle, and the merge is heap-merge.
  * That is the plan shape a top-k-per-group wants at 100 TB: no
  * full-input sort anywhere (contrast WindowGroupLimit, which still
  * requires its child sorted — docs/AUDIT_q16_wgl_r17.md), no unbounded
  * buffer.
  *
  * Works over any orderable type including structs, so
  * `groupArraySorted(3, struct(-price, key))` is "top 3 rows by price
  * desc, key asc" — the q16b_topn_agg kernel. Determinism: the value
  * ordering is total (interpreted ordering), so the result is
  * independent of partition count and merge order. Nulls are skipped
  * (standard aggregate-input semantics, same as collect_list).
  */
case class GraftGroupArraySorted(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[AnyRef]] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"groupArraySorted n must be an integer literal, got $other")
  }

  private lazy val ord: Ordering[AnyRef] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[AnyRef]]

  override def left: Expression  = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("groupArraySorted n must be a foldable integer literal")
    } else if (kExpr.dataType != IntegerType && kExpr.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(s"groupArraySorted n must be integral, got ${kExpr.dataType.sql}")
    } else if (!RowOrdering.isOrderable(child.dataType)) {
      TypeCheckResult.TypeCheckFailure(s"groupArraySorted does not support ${child.dataType.sql} values")
    } else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "groupArraySorted"

  // max-heap on the value ordering: head is the LARGEST kept value, the
  // one a smaller incoming value evicts
  override def createAggregationBuffer(): mutable.PriorityQueue[AnyRef] =
    new mutable.PriorityQueue[AnyRef]()(ord)

  private def offer(buffer: mutable.PriorityQueue[AnyRef], v: AnyRef): Unit = {
    if (buffer.size < k) buffer.enqueue(v)
    else if (ord.compare(v, buffer.head) < 0) {
      buffer.dequeue()
      buffer.enqueue(v)
    }
  }

  override def update(buffer: mutable.PriorityQueue[AnyRef], input: InternalRow): mutable.PriorityQueue[AnyRef] = {
    val v = child.eval(input)
    if (v != null && k > 0) {
      // copy: eval over unsafe rows may return a reused buffer-backed value.
      // Only copy when the value can actually be admitted — the common
      // path at 100 TB is "not in the top n", which must stay alloc-free.
      if (buffer.size < k || ord.compare(v.asInstanceOf[AnyRef], buffer.head) < 0) {
        offer(buffer, InternalRow.copyValue(v).asInstanceOf[AnyRef])
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[AnyRef], other: mutable.PriorityQueue[AnyRef]): mutable.PriorityQueue[AnyRef] = {
    other.foreach(v => offer(buffer, v))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[AnyRef]): Any =
    new GenericArrayData(buffer.toArray[AnyRef].sorted(ord).toArray[Any])

  // single-value rows through an UnsafeProjection — the standard wire
  // format for typed imperative aggregates (same as GraftTopK's).
  // Instance-cached: under ObjectHashAggregate's sort-fallback,
  // serialize runs per buffer — exactly the memory-pressured path that
  // must not pay per-call projection codegen/setup.
  private lazy val rowTypes: Array[DataType] = Array(child.dataType)
  @transient private lazy val serProjection: UnsafeProjection =
    UnsafeProjection.create(rowTypes)

  override def serialize(buffer: mutable.PriorityQueue[AnyRef]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      buffer.foreach { v =>
        val unsafeRow = serProjection.apply(InternalRow.apply(v))
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

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[AnyRef] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val buffer = createAggregationBuffer()
      val row = new UnsafeRow(1)
      var size = in.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        in.readFully(bs)
        row.pointTo(bs, size)
        // each row points into its own byte array, so no copy needed
        buffer.enqueue(row.get(0, child.dataType).asInstanceOf[AnyRef])
        size = in.readInt()
      }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftGroupArraySorted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftGroupArraySorted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftGroupArraySorted =
    copy(child = newLeft, kExpr = newRight)
}
