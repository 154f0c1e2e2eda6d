package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Array-pair ranking metrics: ROC AUC (CH's arrayROCAUC/arrayAUC)
  * and normalized Gini. Per-row kernels over two parallel arrays —
  * scores and 0/1 labels — so they compose with groupArray the way
  * the ClickHouse originals do (aggregate → score an eval set per
  * group). O(n log n) per row in the array length; CodegenFallback
  * because the inputs are arrays, not scalars (never on a hot scan
  * path — these run post-aggregation). */
object ArrayMetricKernels {

  def toDoubles(a: ArrayData, dt: DataType): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    dt match {
      case DoubleType => while (i < n) { out(i) = a.getDouble(i); i += 1 }
      case _ =>
        val objs = a.toObjectArray(dt)
        while (i < n) {
          out(i) = objs(i) match {
            case d: java.lang.Double  => d
            case f: java.lang.Float   => f.toDouble
            case l: java.lang.Long    => l.toDouble
            case x: java.lang.Integer => x.toDouble
            case s: java.lang.Short   => s.toDouble
            case b: java.lang.Byte    => b.toDouble
            case d: Decimal           => d.toDouble
            case other => throw new IllegalArgumentException(s"non-numeric element $other")
          }
          i += 1
        }
    }
    out
  }
  private type Decimal = org.apache.spark.sql.types.Decimal

  /** Mann–Whitney AUC with average-rank tie handling: rank all scores
    * ascending, AUC = (Σ ranks of positives − P(P+1)/2) / (P·N). */
  def auc(scores: Array[Double], labels: Array[Double]): Double = {
    val n = scores.length
    require(labels.length == n, "arrayROCAUC: score/label arrays differ in length")
    if (n == 0) return 0.0
    val order = (0 until n).sortBy(scores(_)).toArray
    val ranks = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && scores(order(j + 1)) == scores(order(i))) j += 1
      val avg = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      var k = i
      while (k <= j) { ranks(order(k)) = avg; k += 1 }
      i = j + 1
    }
    var pos = 0L
    var sumPos = 0.0
    i = 0
    while (i < n) {
      if (labels(i) > 0) { pos += 1; sumPos += ranks(i) }
      i += 1
    }
    val neg = n - pos
    if (pos == 0 || neg == 0) return 0.0
    (sumPos - pos * (pos + 1) / 2.0) / (pos.toDouble * neg)
  }

  /** Normalized Gini: gini of labels ordered by predicted score,
    * over gini of labels ideally ordered — 2·AUC−1 for binary
    * labels, but computed on the Lorenz sum so graded labels work. */
  def normalizedGini(pred: Array[Double], labels: Array[Double]): Double = {
    val n = pred.length
    require(labels.length == n, "arrayNormalizedGini: arrays differ in length")
    if (n == 0) return 0.0
    def gini(order: Array[Int]): Double = {
      val total = labels.sum
      if (total == 0) return 0.0
      var cum = 0.0
      var sumCum = 0.0
      var i = 0
      while (i < n) { cum += labels(order(i)); sumCum += cum; i += 1 }
      (2.0 * sumCum / (n * total) - (n + 1.0) / n)
    }
    val byPredDesc = (0 until n).sortBy(i => -pred(i)).toArray
    val ideal = (0 until n).sortBy(i => -labels(i)).toArray
    val g = gini(byPredDesc)
    val gMax = gini(ideal)
    if (gMax == 0.0) 0.0 else g / gMax
  }
}

case class ArrayRocAuc(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arrayROCAUC"
  private lazy val lType = left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val rType = right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayMetricKernels.auc(
      ArrayMetricKernels.toDoubles(a.asInstanceOf[ArrayData], lType),
      ArrayMetricKernels.toDoubles(b.asInstanceOf[ArrayData], rType))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayRocAuc =
    copy(left = l, right = r)
}

case class ArrayNormalizedGini(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "arrayNormalizedGini"
  private lazy val lType = left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private lazy val rType = right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayMetricKernels.normalizedGini(
      ArrayMetricKernels.toDoubles(a.asInstanceOf[ArrayData], lType),
      ArrayMetricKernels.toDoubles(b.asInstanceOf[ArrayData], rType))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayNormalizedGini =
    copy(left = l, right = r)
}
