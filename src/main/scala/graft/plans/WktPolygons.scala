package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cartesian polygon kernels behind ClickHouse's computational-
  * geometry family: readWKTPolygon, polygonAreaCartesian,
  * polygonPerimeterCartesian, polygonConvexHullCartesian. The CH
  * Polygon type Array(Array(Tuple(Float64, Float64))) maps to
  * ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>> — ring 0 is the outer
  * boundary, later rings are holes; WKT's closing duplicate vertex is
  * kept verbatim on parse (as ClickHouse does) and tolerated by every
  * consumer. Reference surface: the scanner prompt's geo family
  * (/root/reference/src/prompts/scanner.py:18-35).
  *
  * Spherical/geographic variants (polygonAreaSpherical, …) and
  * polygon set operations (polygonsIntersectionCartesian, …) need a
  * full geometry engine and refuse loudly in [[ChDialect]].
  */
object WktKernels {

  type Ring = Array[(Double, Double)]

  /** `POLYGON((x y, …)[, (hole …)])` → rings. Throws on text that
    * isn't a WKT polygon — matching ClickHouse, whose readWKT*
    * functions error on malformed input rather than returning NULL. */
  def parsePolygon(s: String): Array[Ring] = {
    val t = s.trim
    val up = t.toUpperCase(java.util.Locale.ROOT)
    require(up.startsWith("POLYGON"), s"readWKTPolygon: expected POLYGON(…), got '$s'")
    val body = t.substring("POLYGON".length).trim
    require(body.startsWith("(") && body.endsWith(")"),
      s"readWKTPolygon: expected POLYGON((…)), got '$s'")
    val inner = body.substring(1, body.length - 1).trim
    // split on top-level commas between ring groups
    val rings = scala.collection.mutable.ArrayBuffer[Ring]()
    var depth = 0
    var start = 0
    var i = 0
    def emit(chunk: String): Unit = {
      val r = chunk.trim
      require(r.startsWith("(") && r.endsWith(")"),
        s"readWKTPolygon: malformed ring '$chunk'")
      rings += r.substring(1, r.length - 1).split(",").map { pt =>
        val xy = pt.trim.split("\\s+")
        require(xy.length == 2, s"readWKTPolygon: malformed point '$pt'")
        (xy(0).toDouble, xy(1).toDouble)
      }
    }
    while (i < inner.length) {
      inner.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => emit(inner.substring(start, i)); start = i + 1
        case _ =>
      }
      i += 1
    }
    emit(inner.substring(start))
    rings.toArray
  }

  /** Shoelace over one ring; the closing duplicate vertex (WKT
    * convention) contributes zero, so closed and open rings agree. */
  private def ringArea(r: Ring): Double = {
    var s = 0.0
    var i = 0
    val n = r.length
    while (i < n) {
      val (x1, y1) = r(i)
      val (x2, y2) = r((i + 1) % n)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** |outer| − Σ|holes| — the area of a well-formed polygon
    * independent of ring orientation. */
  def area(rings: Array[Ring]): Double =
    if (rings.isEmpty) 0.0
    else ringArea(rings.head) - rings.tail.map(ringArea).sum

  /** Sum of every ring's boundary length (holes included, matching
    * boost::geometry's perimeter, which ClickHouse wraps). */
  def perimeter(rings: Array[Ring]): Double = rings.map { r =>
    // skip the closing duplicate so it isn't counted as a zero edge
    // plus a wrap edge
    val ring = if (r.length > 1 && r.head == r.last) r.dropRight(1) else r
    var s = 0.0
    var i = 0
    val n = ring.length
    while (i < n && n > 1) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      s += math.hypot(x2 - x1, y2 - y1)
      i += 1
    }
    s
  }.sum

  /** Andrew's monotone-chain convex hull over every vertex of every
    * ring, returned as one CLOSED ring (first vertex repeated last,
    * WKT convention) starting from the lexicographically smallest
    * point — deterministic, hence oracle-able. Collinear boundary
    * points are dropped (strict hull). */
  def convexHull(rings: Array[Ring]): Ring = {
    val pts = rings.flatten.distinct.sorted
    if (pts.length <= 2) return if (pts.isEmpty) pts else pts :+ pts.head
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts) {
      while (lower.length >= 2 && cross(lower(lower.length - 2), lower.last, p) <= 0)
        lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    for (p <- pts.reverse) {
      while (upper.length >= 2 && cross(upper(upper.length - 2), upper.last, p) <= 0)
        upper.remove(upper.length - 1)
      upper += p
    }
    val hull = (lower.dropRight(1) ++ upper.dropRight(1)).toArray
    hull :+ hull.head
  }
}

/** Shared decode of ARRAY<ARRAY<STRUCT<2 numerics>>> into rings. */
trait PolygonArg { self: UnaryExpression =>
  protected lazy val coordTypes: Array[DataType] = {
    val ringType = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType]
    ringType.elementType.asInstanceOf[StructType].fields.map(_.dataType)
  }
  private def num(row: InternalRow, i: Int, dt: DataType): Double = dt match {
    case DoubleType     => row.getDouble(i)
    case FloatType      => row.getFloat(i).toDouble
    case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toDouble
    case IntegerType    => row.getInt(i).toDouble
    case LongType       => row.getLong(i).toDouble
    case ShortType      => row.getShort(i).toDouble
    case other => throw new IllegalArgumentException(
      s"$prettyName: non-numeric coordinate ${other.sql}")
  }
  protected def decode(a: Any): Array[WktKernels.Ring] = {
    val rings = a.asInstanceOf[ArrayData]
    Array.tabulate(rings.numElements()) { ri =>
      val ring = rings.getArray(ri)
      Array.tabulate(ring.numElements()) { pi =>
        val pt = ring.getStruct(pi, 2)
        (num(pt, 0, coordTypes(0)), num(pt, 1, coordTypes(1)))
      }
    }
  }
}

object WktPolygons {
  val PointType: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  val RingType: ArrayType = ArrayType(PointType, containsNull = false)
  val PolygonType: ArrayType = ArrayType(RingType, containsNull = false)

  private[plans] def encodeRing(r: WktKernels.Ring): GenericArrayData =
    new GenericArrayData(r.map { case (x, y) => InternalRow(x, y) }.toArray[Any])
}

case class ReadWktPolygon(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = WktPolygons.PolygonType
  override def prettyName: String = "readWKTPolygon"
  override protected def nullSafeEval(input: Any): Any = {
    val rings = WktKernels.parsePolygon(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(rings.map(WktPolygons.encodeRing).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): ReadWktPolygon = copy(child = c)
}

case class PolygonAreaCartesian(child: Expression)
  extends UnaryExpression with PolygonArg with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "polygonAreaCartesian"
  override protected def nullSafeEval(input: Any): Any = WktKernels.area(decode(input))
  override protected def withNewChildInternal(c: Expression): PolygonAreaCartesian = copy(child = c)
}

case class PolygonPerimeterCartesian(child: Expression)
  extends UnaryExpression with PolygonArg with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "polygonPerimeterCartesian"
  override protected def nullSafeEval(input: Any): Any = WktKernels.perimeter(decode(input))
  override protected def withNewChildInternal(c: Expression): PolygonPerimeterCartesian =
    copy(child = c)
}

case class PolygonConvexHullCartesian(child: Expression)
  extends UnaryExpression with PolygonArg with CodegenFallback {
  override def dataType: DataType = WktPolygons.PolygonType
  override def prettyName: String = "polygonConvexHullCartesian"
  override protected def nullSafeEval(input: Any): Any = {
    val hull = WktKernels.convexHull(decode(input))
    new GenericArrayData(Array[Any](WktPolygons.encodeRing(hull)))
  }
  override protected def withNewChildInternal(c: Expression): PolygonConvexHullCartesian =
    copy(child = c)
}
