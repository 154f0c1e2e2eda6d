package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** ClickHouse's `histogram(n)(x)`: an adaptive equi-depth-ish
  * histogram built by greedy merging of the closest bin centers — no
  * pre-declared bounds, bounded state. The buffer over-provisions to
  * 4n bins between compactions so early inputs don't lock in bad
  * centers; merge concatenates then compacts, so partial aggregation
  * (map-side combine) applies and per-group state is O(n).
  *
  * Output is CH's shape: an array of (lower, upper, height) structs
  * sorted by position, heights summing to the row count. Like the
  * original, the exact bin boundaries depend on merge order across
  * partitions (greedy merging is not associative), so the registry
  * treats it rows-only (SURVEY ⭕) and the spec pins single-partition
  * results plus the invariants: ≤ n bins, nested bounds, conserved
  * mass.
  */
case class GraftHistogram(
    binsExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Array[Double]]] with BinaryLike[Expression] {

  // bin = Array(lower, upper, sum, weight); center = sum / weight
  private type Bin = Array[Double]

  private lazy val nBins: Int = binsExpr.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"histogram bin count must be an integer literal, got $other")
  }
  private def cap: Int = nBins * 4

  override def left: Expression  = binsExpr
  override def right: Expression = child

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"histogram needs a numeric argument, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("height", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "histogram"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Bin] = mutable.ArrayBuffer.empty

  /** Sort by center and greedily merge the closest adjacent pair
    * until at most `target` bins remain. */
  private def compact(buf: mutable.ArrayBuffer[Bin], target: Int): mutable.ArrayBuffer[Bin] = {
    if (buf.length <= target) return buf
    val bins = buf.sortBy(b => b(2) / b(3))
    while (bins.length > target) {
      var bestI = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < bins.length - 1) {
        val d = bins(i + 1)(2) / bins(i + 1)(3) - bins(i)(2) / bins(i)(3)
        if (d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      val (a, b) = (bins(bestI), bins(bestI + 1))
      bins(bestI) = Array(math.min(a(0), b(0)), math.max(a(1), b(1)), a(2) + b(2), a(3) + b(3))
      bins.remove(bestI + 1)
    }
    bins
  }

  override def update(buffer: mutable.ArrayBuffer[Bin], input: InternalRow): mutable.ArrayBuffer[Bin] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val x = v match {
        case d: Double  => d
        case f: Float   => f.toDouble
        case d: Decimal => d.toDouble
        case n: Number  => n.doubleValue()
      }
      buffer += Array(x, x, x, 1.0)
      if (buffer.length > cap * 2) compact(buffer, cap) else buffer
    }
  }

  override def merge(buffer: mutable.ArrayBuffer[Bin], other: mutable.ArrayBuffer[Bin]): mutable.ArrayBuffer[Bin] = {
    buffer ++= other
    compact(buffer, cap)
  }

  override def eval(buffer: mutable.ArrayBuffer[Bin]): Any = {
    val bins = compact(buffer, nBins)
    new GenericArrayData(bins.sortBy(b => b(2) / b(3)).map { b =>
      InternalRow(b(0), b(1), b(3))
    }.toArray[Any])
  }

  override def serialize(buffer: mutable.ArrayBuffer[Bin]): Array[Byte] = {
    val compacted = compact(buffer, cap)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(compacted.length)
      compacted.foreach { b => b.foreach(out.writeDouble) }
      out.flush()
      bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Bin] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val n = in.readInt()
      val buf = mutable.ArrayBuffer.empty[Bin]
      var i = 0
      while (i < n) {
        buf += Array(in.readDouble(), in.readDouble(), in.readDouble(), in.readDouble())
        i += 1
      }
      buf
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftHistogram =
    copy(binsExpr = newLeft, child = newRight)
}
