package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Shared (x, y) point buffer for the chart/downsample aggregates:
  * param (a foldable bucket/point count), then x, then y. Points
  * accumulate with concatenating merges and all real work happens in
  * eval — the PairBufferAgg pattern, duplicated here because these
  * carry a leading parameter child. */
abstract class PointBufferAgg
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  def paramExpr: Expression
  def xExpr: Expression
  def yExpr: Expression

  protected lazy val param: Int = paramExpr.eval() match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long    => l.intValue()
    case other => throw new IllegalArgumentException(s"$prettyName parameter must be an integer literal, got $other")
  }

  override def first: Expression  = paramExpr
  override def second: Expression = xExpr
  override def third: Expression  = yExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!paramExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName parameter must be a foldable literal")
    else if (xExpr.dataType != DoubleType || yExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (DOUBLE, DOUBLE) inputs, got ${xExpr.dataType.sql}, ${yExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Double)], input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val x = xExpr.eval(input)
    val y = yExpr.eval(input)
    if (x != null && y != null)
      buf += ((x.asInstanceOf[Double], y.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Double)], other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    buf ++= other; buf
  }

  /** Points sorted by (x, y) — the deterministic evaluation order. */
  protected def sortedPoints(buf: mutable.ArrayBuffer[(Double, Double)]): Array[(Double, Double)] = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, (a: (Double, Double), b: (Double, Double)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Double.compare(a._2, b._2)
    })
    arr
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(buf.length)
      buf.foreach { case (x, y) => out.writeDouble(x); out.writeDouble(y) }
      out.flush(); bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val n = in.readInt()
      val buf = new mutable.ArrayBuffer[(Double, Double)](n)
      var i = 0
      while (i < n) { buf += ((in.readDouble(), in.readDouble())); i += 1 }
      buf
    } finally in.close()
  }
}

/** ClickHouse `sparkbar(buckets)(x, y)`: a unicode bar chart of the
  * per-bucket y sums over the x range — ▁▂▃▄▅▆▇█ levels scaled to
  * the largest bucket, ' ' for empty buckets, all deterministic
  * (bucket index and level arithmetic are exact double ops on the
  * same inputs regardless of partitioning). State is the point
  * buffer; a pre-bucketed GROUP BY upstream bounds it when x
  * cardinality is huge. */
case class GraftSparkbar(
    paramExpr: Expression,
    xExpr: Expression,
    yExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PointBufferAgg {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true
  override def prettyName: String = "sparkbar"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) return null
    val pts = sortedPoints(buf)
    val (minX, maxX) = (pts.head._1, pts.last._1)
    val n = param
    val sums = new Array[Double](n)
    val seen = new Array[Boolean](n)
    pts.foreach { case (x, y) =>
      val i =
        if (maxX == minX) 0
        else math.min(((x - minX) / (maxX - minX) * n).toInt, n - 1)
      sums(i) += y; seen(i) = true
    }
    val top = sums.max
    val chars = (0 until n).map { i =>
      if (!seen(i) || sums(i) <= 0 || top <= 0) ' '
      else (0x2580 + math.max(1, math.ceil(sums(i) / top * 8).toInt)).toChar
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(chars.mkString)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftSparkbar =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftSparkbar =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftSparkbar =
    copy(paramExpr = f, xExpr = s, yExpr = t)
}

/** ClickHouse `largestTriangleThreeBuckets(n)(x, y)` — Steinarsson's
  * LTTB downsampling: keep the first and last points, split the rest
  * into n−2 buckets, and from each bucket keep the point forming the
  * largest triangle with the previously kept point and the next
  * bucket's average. Deterministic over the (x, y)-sorted stream.
  * Returns array<struct<x,y>>. The buffer holds the group's points —
  * downsampling is a presentation-layer op over an already-reduced
  * series; pre-aggregate upstream when the raw series is huge. */
case class GraftLttb(
    paramExpr: Expression,
    xExpr: Expression,
    yExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PointBufferAgg {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", DoubleType, nullable = false),
                   StructField("y", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "largestTriangleThreeBuckets"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val pts = sortedPoints(buf)
    val n = param
    val picked: Array[(Double, Double)] =
      if (n <= 0) Array.empty
      else if (pts.length <= n) pts
      else if (n == 1) Array(pts.head)
      else if (n == 2) Array(pts.head, pts.last)
      else {
        val out = mutable.ArrayBuffer.empty[(Double, Double)]
        out += pts.head
        val bucketSize = (pts.length - 2).toDouble / (n - 2)
        var a = 0 // index of the previously selected point
        var i = 0
        while (i < n - 2) {
          val rangeStart = (i * bucketSize).toInt + 1
          val rangeEnd   = math.min(((i + 1) * bucketSize).toInt + 1, pts.length - 1)
          val nextStart  = rangeEnd
          val nextEnd    = math.min((((i + 2) * bucketSize).toInt) + 1, pts.length)
          // average of the NEXT bucket (the last "bucket" is the final point)
          var avgX = 0.0; var avgY = 0.0; var cnt = 0
          var j = nextStart
          while (j < nextEnd) { avgX += pts(j)._1; avgY += pts(j)._2; cnt += 1; j += 1 }
          if (cnt == 0) { avgX = pts.last._1; avgY = pts.last._2; cnt = 1 }
          avgX /= cnt; avgY /= cnt
          val (ax, ay) = pts(a)
          var best = rangeStart; var bestArea = -1.0
          j = rangeStart
          while (j < rangeEnd) {
            val area = math.abs((ax - avgX) * (pts(j)._2 - ay) - (ax - pts(j)._1) * (avgY - ay))
            if (area > bestArea) { bestArea = area; best = j }
            j += 1
          }
          out += pts(best)
          a = best
          i += 1
        }
        out += pts.last
        out.toArray
      }
    new GenericArrayData(picked.map { case (x, y) =>
      InternalRow(x, y)
    }.toArray[Any])
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftLttb =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftLttb =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftLttb =
    copy(paramExpr = f, xExpr = s, yExpr = t)
}
