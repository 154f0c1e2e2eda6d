package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, GenericInternalRow, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
import scala.collection.mutable.ArrayBuffer

/** Tie-admitting bounded top-k buffer: rows grouped by sort-key value,
  * groups ordered best-first, pruned to exactly what `rank() <= k`
  * (dense = false) or `dense_rank() <= k` (dense = true) returns.
  *
  * Rank rule: a key group survives iff the number of rows in strictly
  * better groups is < k (that count + 1 IS the group's rank). So the
  * buffer holds at most k-1 rows plus the whole boundary group —
  * output-sized, exactly the rows the filter keeps.
  * Dense rule: at most k distinct key groups, all their rows.
  */
private[plans] final class RankTopKBuffer(val ord: Ordering[InternalRow]) {
  val groups = new java.util.TreeMap[InternalRow, ArrayBuffer[InternalRow]](ord)
  var total: Int = 0

  /** Cheap pre-copy check — the 100 TB common path ("not in the top
    * k") must stay alloc-free. A row tying ANY resident group is
    * always admitted (its group already survives and its own rank is
    * unchanged by the new member). */
  def admits(v: InternalRow, k: Int, dense: Boolean): Boolean = {
    if (groups.isEmpty) return true
    val last = groups.lastEntry()
    val cmp = ord.compare(v, last.getKey)
    if (cmp < 0) true
    else if (cmp == 0) true // joins the (surviving) boundary group
    else if (dense) groups.size < k
    else total < k
  }

  /** Insert an OWNED row (already copied), then re-establish the prune
    * invariant: every resident group survives its rank rule. */
  def insert(v: InternalRow, k: Int, dense: Boolean): Unit = {
    val bucket = groups.get(v)
    if (bucket != null) bucket += v
    else groups.put(v, ArrayBuffer(v))
    total += 1
    if (dense) {
      while (groups.size > k) {
        val dropped = groups.pollLastEntry()
        total -= dropped.getValue.length
      }
    } else {
      var last = groups.lastEntry()
      while (last != null && total - last.getValue.length >= k) {
        groups.pollLastEntry()
        total -= last.getValue.length
        last = groups.lastEntry()
      }
    }
  }
}

/** Bounded tie-admitting top-k ROWS per group under an explicit
  * multi-key sort order — the aggregate kernel behind
  * [[TopKRewrite]]'s `Filter(rank/dense_rank <= k, Window(…))`
  * rewrite (round 19; the row_number sibling is [[GraftRowTopK]]).
  *
  * row_number's k-bounded heap would silently DROP rows a rank filter
  * keeps: `rank() <= k` returns every row tied with the k-th row, and
  * `dense_rank() <= k` returns every row of the top k distinct key
  * values. This kernel buffers rows grouped by key value
  * ([[RankTopKBuffer]]) and prunes by the exact rank rule, so the
  * buffer holds precisely the filter's output for the group — bounded
  * by k distinct keys (dense) or k-1 rows + the boundary tie group
  * (rank).
  *
  * The result array carries each row's computed rank alongside the
  * packed [sortKeys ++ payload] struct: `array<struct<r int, v
  * struct>>`. Ranks computed over the buffer equal the true window
  * ranks because every row better than a buffered row is itself
  * buffered (the prune rule keeps whole prefixes).
  *
  * Scale shape: each map task keeps the group's output rows only,
  * partial aggregation ships ≤ output-size across the shuffle, merge
  * is insert+prune, nothing is sorted but the result walk (TreeMap
  * keeps groups ordered). The admit check is one codegen'd multi-key
  * compare against the boundary key per input row.
  *
  * Tie overflow: a pathological boundary group (millions of rows tied
  * at rank ≤ k) is output-sized but BUFFERED here where the window
  * plan streams it; past `maxBufferRows` (baked at plan time from
  * `spark.graft.topk.rewrite.maxTieRows`) the aggregate fails loudly
  * naming the opt-out conf rather than courting an executor OOM.
  *
  * Float/double sort keys are refused at type-check (mirrored by the
  * rewrite's guard): tie EQUALITY under Double.compare distinguishes
  * -0.0 from 0.0 where SQL equality does not, so rank ties could
  * diverge from the window semantics.
  */
case class GraftRankTopK(
    child: Expression,
    kExpr: Expression,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    dense: Boolean,
    maxBufferRows: Int = 1000000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RankTopKBuffer] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"GraftRankTopK k must be an integer literal, got $other")
  }

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Codegen'd (with interpreted fallback) ordering over the struct's
    * leading sort-key fields — the per-input-row admit compare. */
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
      TypeCheckResult.TypeCheckFailure("GraftRankTopK k must be a foldable integer literal")
    } else child.dataType match {
      case st: StructType if ascending.nonEmpty && ascending.length == nullsFirst.length &&
          ascending.length <= st.length =>
        val keys = st.fields.take(ascending.length)
        val unorderable = keys.filterNot(f => RowOrdering.isOrderable(f.dataType))
        def hasFloat(dt: DataType): Boolean = dt match {
          case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => true
          case st: StructType => st.fields.exists(f => hasFloat(f.dataType))
          case ArrayType(et, _) => hasFloat(et)
          case org.apache.spark.sql.types.MapType(kt, vt, _) => hasFloat(kt) || hasFloat(vt)
          case _ => false
        }
        val floaty = keys.filter(f => hasFloat(f.dataType))
        if (unorderable.nonEmpty) TypeCheckResult.TypeCheckFailure(
          s"GraftRankTopK sort keys must be orderable, got ${unorderable.map(_.dataType.sql).mkString(", ")}")
        else if (floaty.nonEmpty) TypeCheckResult.TypeCheckFailure(
          "GraftRankTopK refuses float/double sort keys (tie equality under total ordering " +
            "distinguishes -0.0 from 0.0 where SQL rank does not)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "GraftRankTopK takes a struct of [sort keys ++ payload] with per-key order flags")
    }
  }

  private lazy val elementType: StructType = StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("v", structType, nullable = false)))

  override def dataType: DataType = ArrayType(elementType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_rank_topk"

  override def createAggregationBuffer(): RankTopKBuffer = new RankTopKBuffer(ord)

  private def guardOverflow(buffer: RankTopKBuffer): Unit = {
    if (buffer.total > maxBufferRows) throw new IllegalStateException(
      s"graft_rank_topk buffered ${buffer.total} rows in one group (boundary-tie blow-up past " +
        s"spark.graft.topk.rewrite.maxTieRows=$maxBufferRows); the result itself is that large — " +
        "raise the conf or disable the rewrite with spark.graft.topk.rewrite=false to stream it " +
        "through the window plan")
  }

  override def update(buffer: RankTopKBuffer, input: InternalRow): RankTopKBuffer = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null && k > 0 && buffer.admits(v, k, dense)) {
      // copy only on admit — eval may return buffer-backed values
      buffer.insert(v.copy(), k, dense)
      guardOverflow(buffer)
    }
    buffer
  }

  override def merge(buffer: RankTopKBuffer, other: RankTopKBuffer): RankTopKBuffer = {
    val it = other.groups.values().iterator()
    while (it.hasNext) {
      val bucket = it.next()
      // other's rows are already owned copies
      bucket.foreach { v =>
        if (buffer.admits(v, k, dense)) buffer.insert(v, k, dense)
      }
    }
    guardOverflow(buffer)
    buffer
  }

  /** Walk groups best-first assigning the rank rule's rank; emit
    * (rank, row) structs. Every buffered row has rank ≤ k by the
    * prune invariant, and its buffer rank equals its true window rank
    * because all better rows are buffered too. */
  override def eval(buffer: RankTopKBuffer): Any = {
    val out = new Array[Any](buffer.total)
    var i = 0
    var groupIdx = 0
    var rowsBefore = 0
    val it = buffer.groups.values().iterator()
    while (it.hasNext) {
      val bucket = it.next()
      val rank = if (dense) groupIdx + 1 else rowsBefore + 1
      bucket.foreach { v =>
        out(i) = new GenericInternalRow(Array[Any](rank, v))
        i += 1
      }
      groupIdx += 1
      rowsBefore += bucket.length
    }
    new GenericArrayData(out)
  }

  @transient private lazy val serProjection: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def serialize(buffer: RankTopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      val it = buffer.groups.values().iterator()
      while (it.hasNext) {
        it.next().foreach { v =>
          val unsafeRow = serProjection.apply(v)
          out.writeInt(unsafeRow.getSizeInBytes)
          unsafeRow.writeToStream(out, scratch)
        }
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally {
      out.close()
      bos.close()
    }
  }

  override def deserialize(bytes: Array[Byte]): RankTopKBuffer = {
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
        // rows point into their own byte arrays — owned, no copy
        buffer.insert(row, k, dense)
        size = in.readInt()
      }
      buffer
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftRankTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftRankTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftRankTopK =
    copy(child = newLeft, kExpr = newRight)
}
