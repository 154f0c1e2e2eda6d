package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, NumericType}
import scala.collection.mutable

/** ClickHouse's statistical aggregate family that genuinely needs
  * buffered state (rank correlation, interval sweeps) — implemented as
  * native `TypedImperativeAggregate`s so they ride Spark's partial
  * aggregation: partitions buffer locally, merge concatenates, and
  * only `eval` pays the O(n log n) sort, once per group on the reduce
  * side. Memory is O(rows per group) — the same envelope ClickHouse's
  * own implementations carry (both buffer every point).
  *
  * [[GraftEntropy]] lives in this family too but reuses the
  * value→count map machinery of [[WeightedMapAgg]]: its state is
  * O(distinct values), not O(rows).
  */
abstract class PairBufferAgg
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[NumericType] && right.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric arguments, got ${left.dataType.sql}, ${right.dataType.sql}")

  private def toD(v: Any): Double = v match {
    case d: java.lang.Double  => d
    case f: java.lang.Float   => f.doubleValue()
    case l: java.lang.Long    => l.doubleValue()
    case i: java.lang.Integer => i.doubleValue()
    case s: java.lang.Short   => s.doubleValue()
    case b: java.lang.Byte    => b.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"$prettyName: non-numeric $other")
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Double)], input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null) buf += ((toD(a), toD(b)))
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Double)], other: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    buf ++= other; buf
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(buf.length)
      buf.foreach { case (a, b) => out.writeDouble(a); out.writeDouble(b) }
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

  /** 1-based average ranks (ties share the mean of their positions). */
  protected def avgRanks(v: Array[Double]): Array[Double] = {
    val idx = v.indices.toArray.sortBy(v)
    val r = new Array[Double](v.length)
    var i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length && v(idx(j + 1)) == v(idx(i))) j += 1
      val avg = (i + j + 2) / 2.0
      var k = i
      while (k <= j) { r(idx(k)) = avg; k += 1 }
      i = j + 1
    }
    r
  }
}

/** `rankCorr(x, y)`: Spearman's rank correlation — Pearson correlation
  * of the average-tie ranks. Merge-order independent (ranking happens
  * once, in eval, over the full group). Null when fewer than two
  * points or either variable is constant. */
case class GraftRankCorr(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "rankCorr"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    if (buf.length < 2) null
    else {
      val rx = avgRanks(buf.map(_._1).toArray)
      val ry = avgRanks(buf.map(_._2).toArray)
      val n = rx.length
      val mx = rx.sum / n
      val my = ry.sum / n
      var sxy = 0.0; var sxx = 0.0; var syy = 0.0
      var i = 0
      while (i < n) {
        val dx = rx(i) - mx; val dy = ry(i) - my
        sxy += dx * dy; sxx += dx * dx; syy += dy * dy
        i += 1
      }
      if (sxx == 0.0 || syy == 0.0) null
      else java.lang.Double.valueOf(sxy / math.sqrt(sxx * syy))
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftRankCorr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftRankCorr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftRankCorr =
    copy(left = l, right = r)
}

/** `maxIntersections(start, end)` / `maxIntersectionsPosition(start,
  * end)`: the maximum number of simultaneously-overlapping half-open
  * intervals [start, end), and the smallest position where that
  * maximum is first reached. The sweep sorts boundary events by
  * (position, delta) so an end at p closes BEFORE a start at p opens —
  * the half-open convention, stated here because ClickHouse leaves it
  * implicit; the q25d oracle replays the identical sweep in SQL. */
case class GraftMaxIntersections(
    left: Expression,
    right: Expression,
    returnPosition: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = LongType
  override def nullable: Boolean  = true
  override def prettyName: String =
    if (returnPosition) "maxIntersectionsPosition" else "maxIntersections"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    if (buf.isEmpty) null
    else {
      val events = new Array[(Double, Int)](buf.length * 2)
      var i = 0
      buf.foreach { case (s, e) =>
        events(i) = (s, 1); events(i + 1) = (e, -1); i += 2
      }
      java.util.Arrays.sort(events, Ordering.Tuple2[Double, Int])
      var cur = 0L; var best = 0L; var bestPos = 0.0
      events.foreach { case (pos, delta) =>
        cur += delta
        if (cur > best) { best = cur; bestPos = pos }
      }
      java.lang.Long.valueOf(if (returnPosition) bestPos.toLong else best)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMaxIntersections =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftMaxIntersections =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftMaxIntersections =
    copy(left = l, right = r)
}

/** `entropy(x)`: Shannon entropy (bits) of the value distribution —
  * state is the value→count map of [[WeightedMapAgg]] (weight pinned
  * to 1), so memory is O(distinct values) and merges sum counts.
  * `+ 0.0` canonicalizes the single-value group's −0.0. */
case class GraftEntropy(
    param: Expression,
    child: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends WeightedMapAgg {

  def this(child: Expression) = this(Literal(1), child, Literal(1L))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "entropy"

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    val total = buffer.valuesIterator.sum.toDouble
    if (total <= 0) null
    else {
      var h = 0.0
      buffer.valuesIterator.foreach { c =>
        if (c > 0) { val p = c / total; h -= p * (math.log(p) / math.log(2.0)) }
      }
      java.lang.Double.valueOf(h + 0.0)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftEntropy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftEntropy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftEntropy =
    copy(param = f, child = s, weight = t)
}

/** `intervalLengthSum(start, end)`: total length of the UNION of the
  * intervals — overlaps counted once (merge-sweep over start-sorted
  * intervals at eval). Closed vs half-open is measure-equivalent here;
  * degenerate intervals (end ≤ start) contribute nothing, matching the
  * segment-union reading. */
case class GraftIntervalLengthSum(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "intervalLengthSum"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val iv = buf.filter { case (s, e) => e > s }.sortBy(identity)
    if (iv.isEmpty) (if (buf.isEmpty) null else java.lang.Double.valueOf(0.0))
    else {
      var total = 0.0
      var (curS, curE) = iv.head
      iv.tail.foreach { case (s, e) =>
        if (s > curE) { total += curE - curS; curS = s; curE = e }
        else if (e > curE) curE = e
      }
      total += curE - curS
      java.lang.Double.valueOf(total)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftIntervalLengthSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftIntervalLengthSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftIntervalLengthSum =
    copy(left = l, right = r)
}

/** The categorical-association family — `cramersV`,
  * `cramersVBiasCorrected`, `theilsU`, `contingency` — over a joint
  * (x, y) contingency map: the buffer (via [[WeightedMapAgg]], keyed
  * by the (x, y) struct, weight 1) is O(distinct pairs) and merges by
  * count summation; eval builds marginals and the χ² sum over the full
  * observed category cross product. theilsU is the uncertainty
  * coefficient U(X|Y) = (H(X) − H(X|Y)) / H(X). Null when degenerate
  * (single category on either axis; empty group). */
case class GraftAssociation(
    param: Expression,
    child: Expression,
    weight: Expression,
    kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends WeightedMapAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = kind

  // the (x, y) struct key: the base class's typeWithProperEquals check
  // rejects structs wholesale, but a struct of atomic fields copied via
  // InternalRow.copyValue compares correctly as a map key
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: org.apache.spark.sql.types.StructType
      if s.length == 2 && s.forall(f => TypeUtils.typeWithProperEquals(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires two atomic-typed arguments, got ${other.sql}")
  }

  // Map keys MUST have one canonical representation: update-path
  // struct values arrive as GenericInternalRow while deserialized
  // merge-path keys are UnsafeRows, and the two never compare equal.
  // Project every key through the same UnsafeProjection layout the
  // wire format uses. Rows with a null category are skipped (the
  // standard aggregate null contract).
  @transient private lazy val keyProj = UnsafeProjection.create(
    child.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fields.map(_.dataType))

  override def update(buffer: mutable.HashMap[AnyRef, Long], input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val key = keyProj(r).copy()
        buffer.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
      }
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[AnyRef, Long]): Any = {
    if (buffer.isEmpty) return null
    val st = child.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val cells = buffer.toSeq.map { case (k, c) =>
      val row = k.asInstanceOf[InternalRow]
      // keys only need identity (map/equality), not decoding
      ((row.get(0, st(0).dataType), row.get(1, st(1).dataType)), c.toDouble)
    }
    val n  = cells.map(_._2).sum
    val xm = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val ym = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val kx = xm.size
    val ky = ym.size
    if (kind == "theilsU") {
      def h(counts: Iterable[Double]): Double = {
        val t = counts.sum
        -counts.filter(_ > 0).map { c => val p = c / t; p * math.log(p) }.sum
      }
      val hx = h(xm.values)
      if (hx == 0.0) return null
      // H(X|Y) = Σ_y p(y) · H(X | Y=y)
      val hxy = ym.map { case (y, ny) =>
        (ny / n) * h(cells.filter(_._1._2 == y).map(_._2))
      }.sum
      return java.lang.Double.valueOf((hx - hxy) / hx)
    }
    val joint = cells.map { case ((x, y), c) => (x, y) -> c }.toMap
    var chi2 = 0.0
    xm.foreach { case (x, nx) =>
      ym.foreach { case (y, ny) =>
        val e = nx * ny / n
        val o = joint.getOrElse((x, y), 0.0)
        chi2 += (o - e) * (o - e) / e
      }
    }
    kind match {
      case "contingency" => java.lang.Double.valueOf(math.sqrt(chi2 / (chi2 + n)))
      case "cramersV" =>
        if (math.min(kx, ky) < 2) null
        else java.lang.Double.valueOf(math.sqrt(chi2 / (n * (math.min(kx, ky) - 1))))
      case "cramersVBiasCorrected" =>
        if (math.min(kx, ky) < 2 || n <= 1) null
        else {
          val phi2 = chi2 / n
          val phi2c = math.max(0.0, phi2 - (kx - 1.0) * (ky - 1.0) / (n - 1))
          val kxc = kx - (kx - 1.0) * (kx - 1.0) / (n - 1)
          val kyc = ky - (ky - 1.0) * (ky - 1.0) / (n - 1)
          val d = math.min(kxc, kyc) - 1
          if (d <= 0) null else java.lang.Double.valueOf(math.sqrt(phi2c / d))
        }
      case other => throw new IllegalStateException(s"unknown association kind $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftAssociation =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftAssociation =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftAssociation =
    copy(param = f, child = s, weight = t)
}

/** Two-sided p-value for a Student t statistic: 2·P(T_df ≥ |t|),
  * through commons-math3's TDistribution (a Spark-provided
  * dependency). Interpreted-only (CodegenFallback) — p-values sit at
  * the top of aggregate results, never in per-row hot loops. */
case class StudentTPValue(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "graft_t_pvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires double (t, df)")

  override protected def nullSafeEval(t: Any, df: Any): Any = {
    val dfv = df.asInstanceOf[Double]
    if (dfv <= 0 || dfv.isNaN) null
    else {
      val dist = new org.apache.commons.math3.distribution.TDistribution(dfv)
      java.lang.Double.valueOf(2.0 * dist.cumulativeProbability(-math.abs(t.asInstanceOf[Double])))
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StudentTPValue =
    copy(left = l, right = r)
}

/** `mannWhitneyUTest(value, sample_index)`: the Mann–Whitney U
  * statistic of sample 0 vs sample 1 (U₀ = R₀ − n₀(n₀+1)/2 over
  * average-tie ranks of the pooled values — the rank-sum convention).
  * The STATISTIC is returned, like the t-test family here (q25c's
  * precedent); its null distribution is the caller's concern. Null
  * when either sample is empty. Merge-order independent: ranking
  * happens once, in eval, over the full group. */
case class GraftMannWhitneyU(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "mannWhitneyUTest"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val n0 = buf.count(_._2 == 0.0)
    val n1 = buf.length - n0
    if (n0 == 0 || n1 == 0) null
    else {
      val ranks = avgRanks(buf.map(_._1).toArray)
      var r0 = 0.0
      var i = 0
      while (i < buf.length) {
        if (buf(i)._2 == 0.0) r0 += ranks(i)
        i += 1
      }
      java.lang.Double.valueOf(r0 - n0.toDouble * (n0 + 1) / 2.0)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftMannWhitneyU =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftMannWhitneyU =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftMannWhitneyU =
    copy(left = l, right = r)
}

/** `kolmogorovSmirnovTest(value, sample_index)`: the two-sample KS D
  * statistic — the largest absolute gap between the two empirical
  * CDFs, evaluated at every pooled value. Statistic-only, like the
  * rest of the test family. Null when either sample is empty. */
case class GraftKolmogorovSmirnov(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "kolmogorovSmirnovTest"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val s0 = buf.collect { case (v, g) if g == 0.0 => v }.toArray
    val s1 = buf.collect { case (v, g) if g != 0.0 => v }.toArray
    if (s0.isEmpty || s1.isEmpty) null
    else {
      java.util.Arrays.sort(s0)
      java.util.Arrays.sort(s1)
      var i = 0; var j = 0
      var d = 0.0
      // sweep the merged order; after consuming every copy of a value
      // from both sides, the ECDF gap at that value is |i/n0 - j/n1|
      while (i < s0.length || j < s1.length) {
        val v = if (j >= s1.length || (i < s0.length && s0(i) <= s1(j))) s0(i) else s1(j)
        while (i < s0.length && s0(i) == v) i += 1
        while (j < s1.length && s1(j) == v) j += 1
        val gap = math.abs(i.toDouble / s0.length - j.toDouble / s1.length)
        if (gap > d) d = gap
      }
      java.lang.Double.valueOf(d)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftKolmogorovSmirnov =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftKolmogorovSmirnov =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftKolmogorovSmirnov =
    copy(left = l, right = r)
}

/** `deltaSumTimestamp(value, ts)`: sum of POSITIVE deltas between
  * consecutive values ordered by (ts, value). ClickHouse's own runs
  * in block-store order and is nondeterministic under parallel merge
  * (its docs warn so, same story as deltaSum/q78); the explicit
  * (ts, value) order here is deterministic and merge-order
  * independent, hence oracle-able. The ts argument is any numeric or
  * timestamp expression (cast upstream). */
case class GraftDeltaSumTimestamp(
    left: Expression,   // value
    right: Expression,  // timestamp (as numeric)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends PairBufferAgg {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = false
  override def prettyName: String = "deltaSumTimestamp"

  override def eval(buf: mutable.ArrayBuffer[(Double, Double)]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, (a: (Double, Double), b: (Double, Double)) => {
      val c = java.lang.Double.compare(a._2, b._2)
      if (c != 0) c else java.lang.Double.compare(a._1, b._1)
    })
    var sum = 0.0
    var i = 1
    while (i < arr.length) {
      val d = arr(i)._1 - arr(i - 1)._1
      if (d > 0) sum += d
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftDeltaSumTimestamp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftDeltaSumTimestamp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftDeltaSumTimestamp =
    copy(left = l, right = r)
}

/** `analysisOfVariance(value, group_index)` — one-way ANOVA F
  * statistic (statistic-only, like the t-test family; ClickHouse
  * returns an (F, p) tuple). The buffer keys per-group count/sum/
  * sum-of-squares — O(#groups), NOT O(rows), so a 100 TB fold ships
  * three doubles per group per partition and merges by summation
  * (commutative + associative → partition-order independent).
  * F = [(T − S²/n)/(k−1)] / [(Q − T)/(n−k)] with T = Σ_g S_g²/n_g,
  * S = Σx, Q = Σx². NULL when k < 2 or n ≤ k (no within-group df). */
case class GraftAnova(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Array[Double]]] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"analysisOfVariance expects (DOUBLE, BIGINT), got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "analysisOfVariance"

  override def createAggregationBuffer(): mutable.HashMap[Long, Array[Double]] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Array[Double]], input: InternalRow): mutable.HashMap[Long, Array[Double]] = {
    val v = left.eval(input)
    val g = right.eval(input)
    if (v != null && g != null) {
      val x = v.asInstanceOf[Double]
      val s = buf.getOrElseUpdate(g.asInstanceOf[Long], Array(0.0, 0.0, 0.0))
      s(0) += 1.0; s(1) += x; s(2) += x * x
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Long, Array[Double]], other: mutable.HashMap[Long, Array[Double]]): mutable.HashMap[Long, Array[Double]] = {
    other.foreach { case (g, o) =>
      val s = buf.getOrElseUpdate(g, Array(0.0, 0.0, 0.0))
      s(0) += o(0); s(1) += o(1); s(2) += o(2)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Array[Double]]): Any = {
    val k = buf.size
    if (k < 2) return null
    var n = 0.0; var sum = 0.0; var sq = 0.0; var t = 0.0
    buf.valuesIterator.foreach { s =>
      n += s(0); sum += s(1); sq += s(2); t += s(1) * s(1) / s(0)
    }
    if (n <= k) return null
    val between = (t - sum * sum / n) / (k - 1)
    val within  = (sq - t) / (n - k)
    java.lang.Double.valueOf(between / within)
  }

  override def serialize(buf: mutable.HashMap[Long, Array[Double]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try {
      out.writeInt(buf.size)
      buf.foreach { case (g, s) =>
        out.writeLong(g); out.writeDouble(s(0)); out.writeDouble(s(1)); out.writeDouble(s(2))
      }
      out.flush(); bos.toByteArray
    } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Array[Double]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val n = in.readInt()
      val buf = mutable.HashMap.empty[Long, Array[Double]]
      var i = 0
      while (i < n) {
        buf.update(in.readLong(), Array(in.readDouble(), in.readDouble(), in.readDouble()))
        i += 1
      }
      buf
    } finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftAnova =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftAnova =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftAnova =
    copy(left = l, right = r)
}

/** `exponentialMovingAverage(halflife)(value, time)` and
  * `exponentialTimeDecayedSum(tau)(value, time)` — decayed folds to
  * the group's LATEST time point. The buffer is four doubles (seen,
  * maxT, num, den) kept rescaled to the current max time, so the
  * decay weights never overflow no matter how large the raw time
  * axis is (2^(t/h) on an epoch axis would be +inf); update and
  * merge re-anchor whichever side is older. Modes: `avg` weights by
  * 2^(−Δt/halflife) and normalizes (CH exponentialMovingAverage);
  * `sum` weights by e^(−Δt/tau) unnormalized (CH
  * exponentialTimeDecayedSum). Merge is associative and commutative
  * up to FP rounding — the oracle replays the same closed form with
  * one max(t) pass. */
case class GraftExpDecay(
    valueExpr: Expression,
    timeExpr: Expression,
    paramExpr: Expression,
    mode: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  private lazy val tau: Double = paramExpr.eval() match {
    case d: java.lang.Double  => d
    case f: java.lang.Float   => f.doubleValue()
    case l: java.lang.Long    => l.doubleValue()
    case i: java.lang.Integer => i.doubleValue()
    case other => throw new IllegalArgumentException(s"$prettyName: non-constant window $other")
  }

  private def decay(dt: Double): Double =
    if (mode == "avg") math.pow(2.0, -dt / tau) else math.exp(-dt / tau)

  override def first: Expression  = valueExpr
  override def second: Expression = timeExpr
  override def third: Expression  = paramExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!paramExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName window must be a constant")
    else if (valueExpr.dataType != DoubleType || timeExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (DOUBLE, DOUBLE) inputs, got ${valueExpr.dataType.sql}, ${timeExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String =
    mode match {
      case "avg"    => "exponentialMovingAverage"
      case "eavg"   => "exponentialTimeDecayedAvg"
      case "ecount" => "exponentialTimeDecayedCount"
      case "emax"   => "exponentialTimeDecayedMax"
      case _        => "exponentialTimeDecayedSum"
    }

  // buffer: [seen, maxT, num, den], num/den anchored at maxT
  override def createAggregationBuffer(): Array[Double] = Array(0.0, 0.0, 0.0, 0.0)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = valueExpr.eval(input)
    val t = timeExpr.eval(input)
    if (v == null || t == null) return buf
    val x = v.asInstanceOf[Double]
    val ts = t.asInstanceOf[Double]
    if (buf(0) == 0.0) { buf(0) = 1.0; buf(1) = ts; buf(2) = x; buf(3) = 1.0 }
    else if (ts <= buf(1)) {
      val w = decay(buf(1) - ts)
      if (mode == "emax") buf(2) = math.max(buf(2), x * w)
      else { buf(2) += x * w; buf(3) += w }
    } else {
      val f = decay(ts - buf(1))
      if (mode == "emax") buf(2) = math.max(buf(2) * f, x)
      else { buf(2) = buf(2) * f + x; buf(3) = buf(3) * f + 1.0 }
      buf(1) = ts
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other(0) == 0.0) return buf
    if (buf(0) == 0.0) { System.arraycopy(other, 0, buf, 0, 4); return buf }
    if (other(1) <= buf(1)) {
      val f = decay(buf(1) - other(1))
      if (mode == "emax") buf(2) = math.max(buf(2), other(2) * f)
      else { buf(2) += other(2) * f; buf(3) += other(3) * f }
    } else {
      val f = decay(other(1) - buf(1))
      if (mode == "emax") buf(2) = math.max(buf(2) * f, other(2))
      else { buf(2) = buf(2) * f + other(2); buf(3) = buf(3) * f + other(3) }
      buf(1) = other(1)
    }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf(0) == 0.0) null
    else java.lang.Double.valueOf(mode match {
      case "avg" | "eavg" => buf(2) / buf(3)
      case "ecount"       => buf(3)
      case _              => buf(2) // sum, emax
    })

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    try { buf.foreach(out.writeDouble); out.flush(); bos.toByteArray } finally out.close()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    try Array(in.readDouble(), in.readDouble(), in.readDouble(), in.readDouble())
    finally in.close()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GraftExpDecay =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GraftExpDecay =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): GraftExpDecay =
    copy(valueExpr = f, timeExpr = s, paramExpr = t)
}
