package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}
import scala.collection.mutable

/** Bounded-heap top-k ROWS per group, under an explicit multi-key sort
  * order — the aggregate kernel behind [[TopKRewrite]]'s automatic
  * `Filter(rn <= k, Window(row_number))` → aggregate rewrite.
  *
  * [[GraftGroupArraySorted]] (the user-facing `groupArraySorted`)
  * orders by the VALUE's natural ascending order, which forced q16b to
  * spell "price desc" as `struct(-price, …)` — a trick that only works
  * for numerics. This kernel instead takes the whole row packed as a
  * struct `[sortKey_1..sortKey_n, payload_1..payload_m]` plus the
  * per-key direction/null-ordering flags, and orders the heap with the
  * exact `SortOrder` semantics of the window spelling it replaces —
  * strings desc, NULLS LAST, anything `RowOrdering.isOrderable`.
  *
  * Scale shape (the reason this exists): each map task keeps ≤ k rows
  * per group, partial aggregation ships `groups × k` rows across the
  * shuffle, the merge is heap-merge, and NOTHING is ever sorted except
  * the k-element result arrays. Contrast the window plan, where even
  * WindowGroupLimit's pushdown requires each task's FULL input sorted
  * first (docs/AUDIT_q16_wgl_r17.md — the sf100 spill source).
  *
  * Determinism: exactly row_number's — if the sort order is total the
  * result is the unique top-k; if not, ties keep an arbitrary winner,
  * the same nondeterminism the window spelling already has.
  */
case class GraftRowTopK(
    child: Expression,
    kExpr: Expression,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"GraftRowTopK k must be an integer literal, got $other")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Heap ordering = the window's ORDER BY, bound to the struct's
    * leading fields. Codegen'd with interpreted fallback (round 19):
    * the heap only holds ≤ k+1 rows, but the ADMIT CHECK runs once
    * per input row — on a 100 TB scan an interpreted multi-key
    * compare per row is the hot-path cost the round-18 verdict
    * flagged. */
  @transient private lazy val ord: Ordering[InternalRow] = {
    val st = structType
    val sortOrders = ascending.indices.map { i =>
      SortOrder(
        BoundReference(i, st(i).dataType, st(i).nullable),
        if (ascending(i)) Ascending else Descending,
        if (nullsFirst(i)) NullsFirst else NullsLast,
        Seq.empty)
    }
    RowOrdering.create(sortOrders, Nil)
  }

  override def left: Expression  = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable || (kExpr.dataType != IntegerType && kExpr.dataType != LongType)) {
      TypeCheckResult.TypeCheckFailure("GraftRowTopK k must be a foldable integer literal")
    } else child.dataType match {
      case st: StructType if ascending.nonEmpty && ascending.length == nullsFirst.length &&
          ascending.length <= st.length =>
        val bad = st.fields.take(ascending.length).filterNot(f => RowOrdering.isOrderable(f.dataType))
        if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"GraftRowTopK sort keys must be orderable, got ${bad.map(_.dataType.sql).mkString(", ")}")
      case _ => TypeCheckResult.TypeCheckFailure(
        "GraftRowTopK takes a struct of [sort keys ++ payload] with per-key order flags")
    }
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_row_topk"

  // max-heap on the sort order: head is the LAST-ranked kept row, the
  // one a better-ranked incoming row evicts
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(ord)

  private def offer(buffer: mutable.PriorityQueue[InternalRow], v: InternalRow): Unit = {
    if (buffer.size < k) buffer.enqueue(v)
    else if (ord.compare(v, buffer.head) < 0) {
      buffer.dequeue()
      buffer.enqueue(v)
    }
  }

  override def update(buffer: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null && k > 0) {
      // copy only on admit — the 100 TB common path ("not in the top
      // k") must stay alloc-free; eval may return buffer-backed values
      if (buffer.size < k || ord.compare(v, buffer.head) < 0) {
        offer(buffer, v.copy())
      }
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[InternalRow], other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(v => offer(buffer, v))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buffer.toArray[InternalRow].sorted(ord).toArray[Any])

  // struct rows through an UnsafeProjection — the standard wire format
  // for typed imperative aggregates. Hoisted to an instance lazy val:
  // under ObjectHashAggregate's sort-fallback serialize runs per
  // buffer, exactly the memory-pressured path that must not pay
  // per-call projection setup.
  @transient private lazy val serProjection: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def serialize(buffer: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      buffer.foreach { v =>
        val unsafeRow = serProjection.apply(v)
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

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val buffer = createAggregationBuffer()
      val numFields = structType.length
      var size = in.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        in.readFully(bs)
        val row = new UnsafeRow(numFields)
        row.pointTo(bs, size)
        // each row points into its own byte array, so no copy needed
        buffer.enqueue(row)
        size = in.readInt()
      }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftRowTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftRowTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftRowTopK =
    copy(child = newLeft, kExpr = newRight)
}
