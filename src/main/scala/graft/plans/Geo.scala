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
