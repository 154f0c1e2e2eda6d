package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's geohash pair and point-in-polygon test as native
  * expressions (interpreted eval — the bit-interleaving loop and the
  * ray cast dominate per-row dispatch, the [[TextHashes]] trade).
  * Standard geohash: interleaved lon/lat bisection bits, 5 per base32
  * character. */
object Geo {
  private[plans] val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  private[plans] def encode(lon: Double, lat: Double, precision: Int): String = {
    val sb = new StringBuilder
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var evenBit = true
    var bits = 0
    var ch = 0
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch << 1 | 1; lonLo = mid } else { ch <<= 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch << 1 | 1; latLo = mid } else { ch <<= 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb.append(Base32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  private[plans] def decode(s: String): (Double, Double) = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var evenBit = true
    s.foreach { c =>
      val idx = Base32.indexOf(c.toLower)
      require(idx >= 0, s"geohashDecode: invalid character '$c'")
      var bit = 4
      while (bit >= 0) {
        val set = (idx >> bit & 1) == 1
        if (evenBit) { val mid = (lonLo + lonHi) / 2; if (set) lonLo = mid else lonHi = mid }
        else         { val mid = (latLo + latHi) / 2; if (set) latLo = mid else latHi = mid }
        evenBit = !evenBit
        bit -= 1
      }
    }
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** geohashEncode(lon, lat, precision): base32 geohash string. */
case class GeohashEncode(lon: Expression, lat: Expression, precision: Expression)
  extends TernaryExpression with CodegenFallback {
  override def first: Expression = lon
  override def second: Expression = lat
  override def third: Expression = precision
  override def dataType: DataType = StringType
  override def prettyName: String = "geohashEncode"
  override protected def nullSafeEval(lo: Any, la: Any, p: Any): Any =
    UTF8String.fromString(Geo.encode(
      lo.asInstanceOf[Double], la.asInstanceOf[Double],
      math.max(1, math.min(12, p.asInstanceOf[Number].intValue()))))
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeohashEncode =
    copy(lon = a, lat = b, precision = c)
}

/** geohashDecode(s): (longitude, latitude) struct — the cell center. */
case class GeohashDecode(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override def prettyName: String = "geohashDecode"
  override protected def nullSafeEval(input: Any): Any = {
    val (lon, lat) = Geo.decode(input.asInstanceOf[UTF8String].toString)
    InternalRow(lon, lat)
  }
  override protected def withNewChildInternal(newChild: Expression): GeohashDecode =
    copy(child = newChild)
}

/** pointInPolygon((x, y), [(x1, y1), …]): even-odd ray cast, boundary
  * points counted inside on the left/bottom edges (the usual
  * half-open convention — deterministic, documented). */
case class PointInPolygon(point: Expression, polygon: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def left: Expression  = point
  override def right: Expression = polygon
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pointInPolygon"

  // tuple literals arrive as DECIMAL fields; columns as double/float —
  // read whatever numeric the struct declares
  private def num(row: InternalRow, i: Int, dt: DataType): Double = dt match {
    case DoubleType     => row.getDouble(i)
    case FloatType      => row.getFloat(i).toDouble
    case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toDouble
    case IntegerType    => row.getInt(i).toDouble
    case LongType       => row.getLong(i).toDouble
    case ShortType      => row.getShort(i).toDouble
    case other => throw new IllegalArgumentException(s"pointInPolygon: non-numeric coordinate ${other.sql}")
  }
  private lazy val ptTypes = point.dataType.asInstanceOf[StructType].fields.map(_.dataType)
  private lazy val vertTypes = polygon.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields.map(_.dataType)

  override protected def nullSafeEval(pt: Any, poly: Any): Any = {
    val p = pt.asInstanceOf[InternalRow]
    val (x, y) = (num(p, 0, ptTypes(0)), num(p, 1, ptTypes(1)))
    val arr = poly.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val vi = arr.getStruct(i, 2)
      val vj = arr.getStruct(j, 2)
      val (xi, yi) = (num(vi, 0, vertTypes(0)), num(vi, 1, vertTypes(1)))
      val (xj, yj) = (num(vj, 0, vertTypes(0)), num(vj, 1, vertTypes(1)))
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(point = newLeft, polygon = newRight)
}

/** geohashesInBox(lonMin, latMin, lonMax, latMax, precision): every
  * geohash cell of the given precision intersecting the box, as an
  * array of strings — CH's tile-cover helper for geo pruning. Cell
  * grid: lon splits ceil(5p/2) times, lat floor(5p/2). Result capped
  * at 100k cells (raise precision bounds-first, like the original,
  * which throws past its own cap). */
case class GeohashesInBox(children: Seq[Expression])
  extends Expression with CodegenFallback {
  require(children.length == 5, "geohashesInBox takes (lonMin, latMin, lonMax, latMax, precision)")
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "geohashesInBox"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) return null
    def dbl(v: Any): Double = v match {
      case d: java.lang.Double  => d
      case f: java.lang.Float   => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long    => l.toDouble
      case d: Decimal           => d.toDouble
      case x => x.toString.toDouble
    }
    val lonMin = dbl(vals(0)); val latMin = dbl(vals(1))
    val lonMax = dbl(vals(2)); val latMax = dbl(vals(3))
    val precision = vals(4) match {
      case i: java.lang.Integer => i.toInt
      case l: java.lang.Long    => l.toInt
      case x => x.toString.toDouble.toInt
    }
    require(precision >= 1 && precision <= 12, "geohashesInBox: precision must be 1..12")
    if (lonMin > lonMax || latMin > latMax)
      return new GenericArrayData(Array.empty[Any])
    val lonBits = (5 * precision + 1) / 2
    val latBits = 5 * precision / 2
    val cellW = 360.0 / (1L << lonBits)
    val cellH = 180.0 / (1L << latBits)
    val lon0 = math.floor((lonMin + 180.0) / cellW)
    val lon1 = math.floor(((lonMax + 180.0) / cellW) - 1e-12)
    val lat0 = math.floor((latMin + 90.0) / cellH)
    val lat1 = math.floor(((latMax + 90.0) / cellH) - 1e-12)
    val nLon = (lon1 - lon0).toLong + 1
    val nLat = (lat1 - lat0).toLong + 1
    require(nLon * nLat <= 100000L,
      s"geohashesInBox: box covers ${nLon * nLat} cells at precision $precision (cap 100000)")
    val out = new Array[Any]((nLon * nLat).toInt)
    var k = 0
    var li = 0L
    while (li < nLon) {
      val lon = -180.0 + (lon0 + li + 0.5) * cellW
      var bi = 0L
      while (bi < nLat) {
        val lat = -90.0 + (lat0 + bi + 0.5) * cellH
        out(k) = UTF8String.fromString(Geo.encode(lon, lat, precision))
        k += 1
        bi += 1
      }
      li += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeohashesInBox = copy(children = newChildren)
}
