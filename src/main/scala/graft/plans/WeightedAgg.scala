package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, Decimal, DoubleType, IntegerType, LongType, ShortType}
import scala.collection.mutable

/** Shared machinery for the ClickHouse weighted-aggregate family
  * (`topKWeighted(k)(v, w)`, `quantileExactWeighted(q)(x, w)`): a
  * value→total-weight map buffer, merged across partitions by
  * summation — commutative and associative, so results are
  * independent of partition count and merge order, which is what
  * makes these exact variants oracle-able (ClickHouse's own
  * topKWeighted is a SpaceSaving sketch that trades that determinism
  * for a hard memory bound). Memory is O(distinct values per group);
  * for ultra-high-cardinality columns pre-aggregate the weights with
  * a groupBy first — the same cost envelope this buffer would need.
  *
  * Weights are non-negative integers (ClickHouse declares UInt);
  * null values and null weights are skipped, like every Spark agg.
  */
abstract class WeightedMapAgg
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]] with TernaryLike[Expression] {

  def param: Expression
  def child: Expression
  def weight: Expression

  override def first: Expression  = param
  override def second: Expression = child
  override def third: Expression  = weight

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!param.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName parameter must be a foldable literal")
    else if (!Seq(ByteType, ShortType, IntegerType, LongType).contains(weight.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName weight must be integral, got ${weight.dataType.sql}")
    else if (!TypeUtils.typeWithProperEquals(child.dataType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName does not support ${child.dataType.sql} values")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty[AnyRef, Long]

  override def update(buffer: mutable.HashMap[AnyRef, Long], input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val delta = w match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long    => l.longValue()
        case s: java.lang.Short   => s.longValue()
        case b: java.lang.Byte    => b.longValue()
        case other                => throw new IllegalArgumentException(s"non-integral weight $other")
      }
      require(delta >= 0, s"$prettyName weight must be non-negative, got $delta")
      // copy: eval over unsafe rows may return a reused buffer-backed value
      val key = InternalRow.copyValue(v).asInstanceOf[AnyRef]
      buffer.updateWith(key) { c => Some(c.getOrElse(0L) + delta) }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[AnyRef, Long], other: mutable.HashMap[AnyRef, Long]): mutable.HashMap[AnyRef, Long] = {
    other.foreach { case (key, wt) => buffer.updateWith(key) { c => Some(c.getOrElse(0L) + wt) } }
    buffer
  }

  // (value, weight) rows through an UnsafeProjection — the standard
  // map-buffer wire format for typed imperative aggregates.
  private lazy val rowTypes: Array[DataType] = Array(child.dataType, LongType)
  // per-deserialized-instance (task-local), so reuse across the many
  // serialize() calls of a high-cardinality GROUP BY is safe
  @transient private lazy val projection = UnsafeProjection.create(rowTypes)

  override def serialize(buffer: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    try {
      buffer.foreach { case (key, wt) =>
        val unsafeRow = projection.apply(InternalRow.apply(key, wt))
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
}

/** `topKWeighted(k)(value, weight)`: the k values with the largest
  * total weight, ordered (weight desc, value asc) — the deterministic
  * tie-break. With weight ≡ 1 it degenerates to [[GraftTopK]]. */
case class GraftTopKWeighted(
    param: Expression,
    child: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends WeightedMapAgg {

  private lazy val k: Int = param.eval() match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long    => l.intValue()
    case other                => throw new IllegalArgumentException(s"topKWeighted k must be an integer literal, got $other")
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "topKWeighted"

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    val valueOrd = TypeUtils.getInterpretedOrdering(child.dataType)
    val entryOrd = new Ordering[(AnyRef, Long)] {
      override def compare(a: (AnyRef, Long), b: (AnyRef, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else valueOrd.compare(a._1.asInstanceOf[Any], b._1.asInstanceOf[Any])
      }
    }
    new GenericArrayData(buffer.toSeq.sorted(entryOrd).take(k).map(_._1).toArray[Any])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftTopKWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftTopKWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftTopKWeighted =
    copy(param = f, child = s, weight = t)
}

/** `quantileExactWeighted(q)(value, weight)`: exact weighted
  * nearest-rank quantile — the smallest value whose cumulative weight
  * (over values sorted ascending) reaches q × total weight, i.e. the
  * q-quantile of the multiset where each value repeats `weight`
  * times. With weight ≡ 1 this is the classic nearest-rank quantile.
  * Returns null for an empty (or all-null) group. */
case class GraftQuantileExactWeighted(
    param: Expression,
    child: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends WeightedMapAgg {

  private lazy val q: Double = param.eval() match {
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float  => f.doubleValue()
    case dec: Decimal        => dec.toDouble
    case i: java.lang.Integer => i.doubleValue()
    case other               => throw new IllegalArgumentException(s"quantileExactWeighted level must be numeric, got $other")
  }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean  = true
  override def prettyName: String = "quantileExactWeighted"

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    // zero-weight values are not part of the weighted multiset — a
    // group of only zero weights has no quantile (null), and at q=0
    // the answer must be the smallest POSITIVELY-weighted value
    val weighted = buffer.toSeq.filter(_._2 > 0)
    if (weighted.isEmpty) null
    else {
      require(q >= 0.0 && q <= 1.0, s"quantile level must be in [0, 1], got $q")
      val valueOrd = TypeUtils.getInterpretedOrdering(child.dataType)
      val sorted = weighted.sortWith((a, b) => valueOrd.compare(a._1.asInstanceOf[Any], b._1.asInstanceOf[Any]) < 0)
      val total = sorted.iterator.map(_._2).sum
      val target = q * total
      var cum = 0L
      var result: AnyRef = sorted.last._1
      val it = sorted.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= target) { result = v; found = true }
      }
      result
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftQuantileExactWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftQuantileExactWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftQuantileExactWeighted =
    copy(param = f, child = s, weight = t)
}

/** `quantileInterpolatedWeighted(q)(value, weight)`: weighted
  * quantile with linear interpolation — the percentile_cont (type-7)
  * quantile of the multiset where each value repeats `weight` times,
  * computed from cumulative weights without materializing the
  * expansion: h = q·(S−1) on the 0-based expanded axis, the two
  * bracketing expanded elements are located by cumulative-weight
  * binary walk, and the result interpolates between them. With
  * weight ≡ 1 this is exactly percentile_cont(q). Shares the
  * value→weight map buffer (O(distinct values), summation merge). */
case class GraftQuantileInterpolatedWeighted(
    param: Expression,
    child: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends WeightedMapAgg {

  private lazy val q: Double = param.eval() match {
    case d: java.lang.Double  => d.doubleValue()
    case f: java.lang.Float   => f.doubleValue()
    case dec: Decimal         => dec.toDouble
    case i: java.lang.Integer => i.doubleValue()
    case other => throw new IllegalArgumentException(s"quantileInterpolatedWeighted level must be numeric, got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "quantileInterpolatedWeighted"

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    val weighted = buffer.toSeq.filter(_._2 > 0)
    if (weighted.isEmpty) null
    else {
      require(q >= 0.0 && q <= 1.0, s"quantile level must be in [0, 1], got $q")
      val sorted = weighted
        .map { case (v, w) => (v.asInstanceOf[Number].doubleValue(), w) }
        .sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      val h    = q * (total - 1)
      val k    = math.floor(h).toLong            // 0-based expanded index
      val frac = h - k
      // value at expanded index i = first value whose cumweight > i
      def at(i: Long): Double = {
        var cum = 0L
        val it = sorted.iterator
        while (it.hasNext) {
          val (v, w) = it.next()
          cum += w
          if (cum > i) return v
        }
        sorted.last._1
      }
      val lo = at(k)
      val hi = if (frac == 0.0) lo else at(k + 1)
      java.lang.Double.valueOf(lo + frac * (hi - lo))
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftQuantileInterpolatedWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftQuantileInterpolatedWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftQuantileInterpolatedWeighted =
    copy(param = f, child = s, weight = t)
}
