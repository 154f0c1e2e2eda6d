package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Time-series array helpers: Tukey-fence outlier scoring, dominant-
  * period detection via a discrete Fourier transform, and classical
  * seasonal decomposition. Per-group kernels over an already-
  * aggregated series array (the groupArray → analyze shape the CH
  * originals are used in), so the per-row cost is amortized over a
  * whole series — never on the raw scan path. */
object SeriesKernels {

  /** Linear-interpolated quantile of a sorted copy (the R-7 rule both
    * DuckDB and numpy default to). */
  def quantileSorted(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    if (n == 1) return sorted(0)
    val pos = q * (n - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, n - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  /** Per-element outlier score: 0 inside the Tukey fences
    * [Qmin − k·IQR, Qmax + k·IQR], distance beyond the fence
    * otherwise (ClickHouse's seriesOutliersDetectTukey contract). */
  def tukeyScores(xs: Array[Double], qMin: Double, qMax: Double, k: Double): Array[Double] = {
    val sorted = xs.clone()
    java.util.Arrays.sort(sorted)
    val q1 = quantileSorted(sorted, qMin)
    val q3 = quantileSorted(sorted, qMax)
    val iqr = q3 - q1
    val lo = q1 - k * iqr
    val hi = q3 + k * iqr
    xs.map { x =>
      if (x < lo) x - lo else if (x > hi) x - hi else 0.0
    }
  }

  /** Dominant period: O(n²) DFT magnitude scan over frequency bins
    * 1..n/2; returns n/k* for the strongest bin, 0 when the series is
    * too short or flat (CH returns NaN-ish "not found" — 0 keeps the
    * type integral-friendly and is spec-pinned). Series longer than
    * 4096 points are analyzed on their last 4096 (bounded work per
    * group; `log`-free map-side cost). */
  def periodDetect(xsIn: Array[Double]): Double = {
    val xs = if (xsIn.length > 4096) xsIn.takeRight(4096) else xsIn
    val n = xs.length
    if (n < 4) return 0.0
    val mean = xs.sum / n
    val centered = xs.map(_ - mean)
    if (centered.forall(v => math.abs(v) < 1e-12)) return 0.0
    var bestK = 0
    var bestMag = 0.0
    var k = 1
    while (k <= n / 2) {
      var re = 0.0
      var im = 0.0
      var t = 0
      val w = -2.0 * math.Pi * k / n
      while (t < n) {
        val a = w * t
        re += centered(t) * math.cos(a)
        im += centered(t) * math.sin(a)
        t += 1
      }
      val mag = re * re + im * im
      if (mag > bestMag) { bestMag = mag; bestK = k }
      k += 1
    }
    if (bestK == 0) 0.0 else math.round(n.toDouble / bestK).toDouble
  }

  /** Classical additive decomposition (NOT Cleveland's LOESS STL —
    * documented approximation): trend = centered moving average of
    * width `period`, seasonal = mean detrended value per phase
    * (normalized to sum 0), residual = x − trend − seasonal. Returns
    * [seasonal, trend, residual], trend edges filled with the nearest
    * computed value so the arrays stay full-length. */
  def decompose(xs: Array[Double], period: Int): Array[Array[Double]] = {
    val n = xs.length
    require(period >= 2, "seriesDecomposeSTL: period must be >= 2")
    require(n >= 2 * period, "seriesDecomposeSTL: need at least two full periods")
    val half = period / 2
    val trend = new Array[Double](n)
    val even = period % 2 == 0
    var i = 0
    while (i < n) {
      val lo = i - half
      val hi = i + half
      if (lo >= 0 && hi < n) {
        var s = 0.0
        if (even) {
          // 2×period centered MA: half-weight endpoints
          s = xs(lo) / 2 + xs(hi) / 2
          var j = lo + 1
          while (j < hi) { s += xs(j); j += 1 }
          trend(i) = s / period
        } else {
          var j = lo
          while (j <= hi) { s += xs(j); j += 1 }
          trend(i) = s / period
        }
      } else trend(i) = Double.NaN
      i += 1
    }
    // edge fill with nearest interior value
    var firstIdx = 0
    while (firstIdx < n && trend(firstIdx).isNaN) firstIdx += 1
    var lastIdx = n - 1
    while (lastIdx >= 0 && trend(lastIdx).isNaN) lastIdx -= 1
    i = 0
    while (i < n) {
      if (trend(i).isNaN) trend(i) = if (i < firstIdx) trend(firstIdx) else trend(lastIdx)
      i += 1
    }
    // per-phase seasonal means over the detrended series
    val sums = new Array[Double](period)
    val counts = new Array[Int](period)
    i = 0
    while (i < n) {
      sums(i % period) += xs(i) - trend(i)
      counts(i % period) += 1
      i += 1
    }
    val phase = Array.tabulate(period)(p => if (counts(p) == 0) 0.0 else sums(p) / counts(p))
    val phaseMean = phase.sum / period
    val seasonal = Array.tabulate(n)(i => phase(i % period) - phaseMean)
    val residual = Array.tabulate(n)(i => xs(i) - trend(i) - seasonal(i))
    Array(seasonal, trend, residual)
  }
}

case class SeriesOutliersTukey(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "seriesOutliersDetectTukey"
  private lazy val elemType = first.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(a: Any, q1: Any, q3: Any, k: Any): Any = {
    val xs = ArrayMetricKernels.toDoubles(a.asInstanceOf[ArrayData], elemType)
    def dbl(v: Any): Double = v match {
      case d: java.lang.Double => d
      case f: java.lang.Float  => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long   => l.toDouble
      case x => x.toString.toDouble
    }
    new GenericArrayData(SeriesKernels.tukeyScores(xs, dbl(q1), dbl(q3), dbl(k)))
  }
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): SeriesOutliersTukey =
    copy(a, b, c, d)
}

case class SeriesPeriodDetect(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "seriesPeriodDetectFFT"
  private lazy val elemType = child.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(a: Any): Any =
    SeriesKernels.periodDetect(ArrayMetricKernels.toDoubles(a.asInstanceOf[ArrayData], elemType))
  override protected def withNewChildInternal(c: Expression): SeriesPeriodDetect = copy(c)
}

case class SeriesDecompose(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "seriesDecomposeSTL"
  private lazy val elemType = left.dataType.asInstanceOf[ArrayType].elementType
  override protected def nullSafeEval(a: Any, p: Any): Any = {
    val xs = ArrayMetricKernels.toDoubles(a.asInstanceOf[ArrayData], elemType)
    val period = p match {
      case i: java.lang.Integer => i.toInt
      case l: java.lang.Long    => l.toInt
      case x => x.toString.toDouble.toInt
    }
    val parts = SeriesKernels.decompose(xs, period)
    new GenericArrayData(parts.map(p => new GenericArrayData(p): Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeriesDecompose =
    copy(l, r)
}
