package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import scala.collection.mutable

/** Distributed element-set buffer: `seen` distinguishes "no input
  * yet" from "empty set", which AND-folds need (the identity of
  * intersection is the universe, not ∅). */
final class BitmapBuffer(var seen: Boolean, val set: mutable.HashSet[Long])

/** Element-generic sibling of [[BitmapBuffer]] for
  * [[GraftArrayIntersectAgg]]. */
final class ArrayIntersectBuffer(var seen: Boolean, val set: mutable.HashSet[Any])

/** ClickHouse's bitmap aggregate family re-expressed as one
  * set-fold `TypedImperativeAggregate`. The engine models a bitmap
  * as a SORTED DISTINCT `array<bigint>` (the Roaring container is a
  * storage codec, not semantics — reference surface:
  * bitmapBuild/groupBitmap* in ClickHouse's bitmap function set).
  * Modes:
  *
  *  - `or`  — set union. Scalar input inserts one element, so the
  *    same mode serves `groupBitmapState(x)` (build from values)
  *    and `groupBitmapOrState(bm)` (merge bitmaps).
  *  - `and` — intersection fold; `seen` makes the no-input identity
  *    explicit so partial merges commute.
  *  - `xor` — symmetric-difference fold (element kept iff present
  *    in an odd number of inputs); toggle is associative and
  *    commutative, so partition merge order can't change results.
  *
  * The buffer dedups eagerly — O(distinct elements per group), the
  * same envelope ClickHouse's roaring state has, and strictly
  * smaller than a collect_list of the inputs. Partial aggregation
  * (map-side combine) applies as with any TIA, so a 1000-executor
  * fold ships one deduped set per partition, not raw rows. */
case class BitmapFoldAgg(
    child: Expression,
    mode: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

  private val isArrayInput: Boolean = child.dataType.isInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case LongType if mode == "or" => TypeCheckResult.TypeCheckSuccess
    case LongType =>
      TypeCheckResult.TypeCheckFailure(
        s"groupBitmap${mode.capitalize} folds bitmap columns (array<bigint>); build states with groupBitmapState first")
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bitmap aggregate expects BIGINT or ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"groupBitmap${mode.capitalize}State"

  override def createAggregationBuffer(): BitmapBuffer =
    new BitmapBuffer(false, mutable.HashSet.empty[Long])

  private def elements(v: Any): Iterator[Long] = v match {
    case a: ArrayData =>
      (0 until a.numElements()).iterator.filterNot(a.isNullAt).map(a.getLong)
    case l: Long => Iterator.single(l)
  }

  override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = child.eval(input)
    if (v == null) return buffer
    val es = elements(v)
    mode match {
      case "or" => buffer.set ++= es
      case "and" =>
        if (!buffer.seen) buffer.set ++= es
        else { val in = es.toSet; buffer.set.filterInPlace(in.contains) }
      case "xor" =>
        // per-input set semantics first (a bitmap is a set), then toggle
        es.toSet.foreach { e: Long => if (!buffer.set.remove(e)) buffer.set += e }
    }
    buffer.seen = true
    buffer
  }

  override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    if (!other.seen) return buffer
    if (!buffer.seen) { buffer.set ++= other.set; buffer.seen = true; return buffer }
    mode match {
      case "or"  => buffer.set ++= other.set
      case "and" => buffer.set.filterInPlace(other.set.contains)
      case "xor" => other.set.foreach { e => if (!buffer.set.remove(e)) buffer.set += e }
    }
    buffer
  }

  override def eval(buffer: BitmapBuffer): Any =
    new GenericArrayData(buffer.set.toArray.sorted)

  override def serialize(buffer: BitmapBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeBoolean(buffer.seen)
      out.writeInt(buffer.set.size)
      buffer.set.foreach(out.writeLong)
      out.flush()
      bos.toByteArray
    } finally { out.close(); bos.close() }
  }

  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val seen = in.readBoolean()
      val n = in.readInt()
      val set = mutable.HashSet.empty[Long]
      var i = 0
      while (i < n) { set += in.readLong(); i += 1 }
      new BitmapBuffer(seen, set)
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapFoldAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapFoldAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapFoldAgg =
    copy(child = newChild)
}

/** `groupArrayIntersect(arr)` — the intersection of every array in
  * the group, returned sorted (deterministic reading of CH's
  * unspecified order, which is what makes it oracle-able). Same
  * seen/∅ distinction as the bitmap AND fold, but element-generic:
  * values are copied out of unsafe rows and serialized through an
  * UnsafeProjection. The buffer only ever SHRINKS after the first
  * input (intersection is anti-monotone), so state is bounded by
  * the smallest array seen so far — merge-friendly at any scale. */
case class GraftArrayIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayIntersectBuffer] with UnaryLike[Expression] {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if org.apache.spark.sql.catalyst.util.TypeUtils.typeWithProperEquals(et) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"groupArrayIntersect expects an array of comparable elements, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "groupArrayIntersect"

  override def createAggregationBuffer(): ArrayIntersectBuffer =
    new ArrayIntersectBuffer(false, mutable.HashSet.empty[Any])

  override def update(buffer: ArrayIntersectBuffer, input: InternalRow): ArrayIntersectBuffer = {
    val v = child.eval(input)
    if (v == null) return buffer
    val a = v.asInstanceOf[ArrayData]
    val incoming = mutable.HashSet.empty[Any]
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i))
        incoming += InternalRow.copyValue(a.get(i, elementType))
      i += 1
    }
    if (!buffer.seen) { buffer.set ++= incoming; buffer.seen = true }
    else buffer.set.filterInPlace(incoming.contains)
    buffer
  }

  override def merge(buffer: ArrayIntersectBuffer, other: ArrayIntersectBuffer): ArrayIntersectBuffer = {
    if (!other.seen) return buffer
    if (!buffer.seen) { buffer.set ++= other.set; buffer.seen = true; return buffer }
    buffer.set.filterInPlace(other.set.contains)
    buffer
  }

  override def eval(buffer: ArrayIntersectBuffer): Any = {
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(elementType)
    new GenericArrayData(buffer.set.toArray.sortWith((a, b) => ord.compare(a, b) < 0))
  }

  private lazy val rowType: Array[DataType] = Array(elementType)

  override def serialize(buffer: ArrayIntersectBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      out.writeBoolean(buffer.seen)
      val projection = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(rowType)
      buffer.set.foreach { v =>
        val row = projection.apply(InternalRow(v))
        out.writeInt(row.getSizeInBytes)
        row.writeToStream(out, scratch)
      }
      out.writeInt(-1)
      out.flush(); bos.toByteArray
    } finally { out.close(); bos.close() }
  }

  override def deserialize(bytes: Array[Byte]): ArrayIntersectBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val seen = in.readBoolean()
      val set = mutable.HashSet.empty[Any]
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      var size = in.readInt()
      while (size >= 0) {
        val bs = new Array[Byte](size)
        in.readFully(bs)
        row.pointTo(bs, size)
        set += InternalRow.copyValue(row.get(0, elementType))
        size = in.readInt()
      }
      new ArrayIntersectBuffer(seen, set)
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftArrayIntersectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftArrayIntersectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GraftArrayIntersectAgg =
    copy(child = newChild)
}
