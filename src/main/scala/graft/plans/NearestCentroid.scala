package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_nearest_cell(vec, centroids)` → int: the argmin cell of
  * `vec` over a literal centroid codebook, by squared euclidean
  * distance with the |v|² term dropped (constant across cells):
  * score(c) = |c|² − 2·v·c, ties to the LOWEST cell id.
  *
  * Exists because the compositional spelling — `array_min` over
  * `nlist` struct((|c|²−2·dot), cell) elements — unrolls one
  * [[DotProduct]] per centroid into the generated method. That is
  * fine at nlist=16 (the toy-gate shape) and fatal at the
  * [[graft.operators.Similarity.autoNlist]] dial (nlist ≈ √N: 448 at
  * the sf10 rehearsal's 200k vectors, thousands at 100 TB), where it
  * blows past JIT/codegen method limits and falls back to
  * per-element interpreted eval — the same failure
  * [[LshBucketIds]] fixed for the plane sweep. Here the whole
  * codebook sweep is one tight primitive loop per row over a
  * flattened `double[]` materialized once per executor.
  *
  * Numeric contract matches the unrolled form exactly: elements cast
  * to double before multiply, sequential left-to-right accumulation,
  * null elements contribute 0, mismatched lengths score the common
  * prefix, |c|² pre-summed left-to-right — so cell assignments (and
  * the q53b DuckDB oracle) are bit-identical.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure("graft_nearest_cell requires a numeric array vector")
    else if (!cbOk || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_nearest_cell requires a foldable array<array<double>> codebook")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  private lazy val elemGet: (ArrayData, Int) => Double =
    left.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case DoubleType  => (a, i) => a.getDouble(i)
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case ShortType   => (a, i) => a.getShort(i).toDouble
      case ByteType    => (a, i) => a.getByte(i).toDouble
      case d: DecimalType => (a, i) => a.getDecimal(i, d.precision, d.scale).toDouble
    }

  // codebook flattened row-major + per-cell |c|², materialized once
  private lazy val (flat: Array[Double], c2: Array[Double], nlist: Int, dim: Int) = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k > 0, "graft_nearest_cell: empty codebook")
    val first = arr.getArray(0)
    val d = first.numElements()
    val f = new Array[Double](k * d)
    val sq = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = arr.getArray(c)
      require(row.numElements() == d, "graft_nearest_cell: ragged codebook")
      var s = 0.0
      var i = 0
      while (i < d) {
        val x = row.getDouble(i)
        f(c * d + i) = x
        s += x * x
        i += 1
      }
      sq(c) = s
      c += 1
    }
    (f, sq, k, d)
  }

  override protected def nullSafeEval(vecAny: Any, cbAny: Any): Any = {
    val v = vecAny.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    // densify once per row so the cell sweep reads a primitive array
    val vd = new Array[Double](n)
    var i = 0
    while (i < n) {
      vd(i) = if (v.isNullAt(i)) 0.0 else elemGet(v, i)
      i += 1
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < nlist) {
      var dot = 0.0
      val off = c * dim
      var j = 0
      while (j < n) { dot += vd(j) * flat(off + j); j += 1 }
      val d2 = c2(c) - 2.0 * dot
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
