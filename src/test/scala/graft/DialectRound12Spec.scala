package graft

/** Round-12 dialect widening: H3 index math, cartesian polygon
  * kernels, subsequence/bit-slice/array-distance scans, snowflake-ID
  * trio, formatRow, type-default introspection, and their refusal
  * edges. */
class DialectRound12Spec extends SparkSpec {
  import spark.implicits._

  private def one[T](sql: String): T =
    spark.sql(s"SELECT $sql AS v").collect().head.getAs[T]("v")

  private def seqOf[T](sql: String): Seq[T] =
    spark.sql(s"SELECT $sql AS v").collect().head.getSeq[T](0)

  // ---- H3 index math (verified against the public doc vector:
  // 0x8928308280fffff res 9, parent(8) = 0x8828308281fffff)

  test("h3GetResolution / h3ToParent on the documented example cell") {
    assert(one[Int]("h3GetResolution(617700169958293503)") == 9)
    // 617700169958293503 == 0x8928308280fffff
    assert(one[Long]("h3ToParent(617700169958293503, 8)") == 0x8828308281fffffL)
    // parent at its own resolution is the cell itself
    assert(one[Long]("h3ToParent(617700169958293503, 9)") == 0x8928308280fffffL)
  }

  test("h3ToChildren inverts h3ToParent and counts 7 per hexagon level") {
    val kids = seqOf[Long]("h3ToChildren(h3ToParent(617700169958293503, 8), 9)")
    assert(kids.length == 7)
    assert(kids.contains(0x8928308280fffffL))
    // every child's parent is the original cell
    kids.foreach { k =>
      assert(one[Long](s"h3ToParent(${k}L, 8)") == 0x8828308281fffffL)
    }
    // two levels down: 49 grandchildren for a hexagon
    assert(seqOf[Long]("h3ToChildren(h3ToParent(617700169958293503, 8), 10)").length == 49)
  }

  test("h3IsValid accepts real cells, rejects structural garbage") {
    assert(one[Boolean]("h3IsValid(617700169958293503)"))
    assert(!one[Boolean]("h3IsValid(0)"))
    assert(!one[Boolean]("h3IsValid(-1)"))
    // digit 9 of the example cell is 3 (011); OR-ing bit 20 makes it
    // 7, the unused marker, inside the used range → invalid
    assert(!one[Boolean]("h3IsValid(617700169958293503 | shiftleft(4, 18))"))
  }

  test("h3 pentagon cells have 6 children and the K-digit rule") {
    // base cell 4 is a pentagon; its res-0 cell: mode 1, res 0, base 4,
    // all 15 digits 7
    val pentagon = (1L << 59) | (4L << 45) | ((1L << 45) - 1)
    assert(one[Boolean](s"h3IsValid(${pentagon}L)"))
    assert(one[Boolean](s"h3IsPentagon(${pentagon}L)"))
    val kids = seqOf[Long](s"h3ToChildren(${pentagon}L, 1)")
    assert(kids.length == 6) // K-axis child deleted
    // the center child is itself a pentagon, edge children are not
    assert(kids.count(k => one[Boolean](s"h3IsPentagon(${k}L)")) == 1)
    // a K-leading digit under a pentagon base is invalid
    val kChild = (pentagon & ~(0xFL << 52) & ~(0x7L << 42)) | (1L << 52) | (1L << 42)
    assert(!one[Boolean](s"h3IsValid(${kChild}L)"))
  }

  test("stringToH3 / h3ToString round-trip; garbage parses to 0") {
    assert(one[Long]("stringToH3('8928308280fffff')") == 0x8928308280fffffL)
    assert(one[String]("h3ToString(617700169958293503)") == "8928308280fffff")
    assert(one[Long]("stringToH3('not-an-index')") == 0L)
  }

  // ---- cartesian polygons

  test("readWKTPolygon parses rings; area subtracts holes; perimeter sums rings") {
    // 10×10 square with a 2×2 hole
    val poly = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0),(4 4, 6 4, 6 6, 4 6, 4 4))"
    assert(one[Double](s"polygonAreaCartesian(readWKTPolygon('$poly'))") == 96.0)
    assert(one[Double](s"polygonPerimeterCartesian(readWKTPolygon('$poly'))") == 48.0)
    val ringSizes = spark.sql(
      s"SELECT transform(readWKTPolygon('$poly'), r -> size(r)) AS v")
      .collect().head.getSeq[Int](0)
    assert(ringSizes == Seq(5, 5))
  }

  test("polygonConvexHullCartesian: hull of a concave shape, deterministic start") {
    // concave arrow: hull drops the notch point (5,2) and keeps corners
    val poly = "POLYGON((0 0, 10 0, 5 2, 10 10, 0 10, 0 0))"
    val hull = spark.sql(
      s"SELECT polygonConvexHullCartesian(readWKTPolygon('$poly')) AS v")
      .selectExpr("transform(v[0], p -> concat(p.x, ':', p.y)) AS pts")
      .collect().head.getSeq[String](0)
    assert(hull.head == hull.last) // closed ring
    assert(!hull.contains("5.0:2.0"))
    assert(hull.head == "0.0:0.0") // lexicographically smallest start
    assert(hull.length == 5)       // 4 corners + closure
  }

  test("readWKTPolygon refuses non-polygon text loudly") {
    val e = intercept[Exception](spark.sql("SELECT polygonAreaCartesian(readWKTPolygon('LINESTRING(0 0, 1 1)'))").collect())
    assert(e.getMessage.contains("POLYGON") || e.getCause != null)
  }

  // ---- subsequence / bitSlice / arrayLevenshteinDistance

  test("hasSubsequence family") {
    assert(one[Boolean]("hasSubsequence('garbage', 'arg')"))
    assert(!one[Boolean]("hasSubsequence('garbage', 'arbb')"))
    assert(one[Boolean]("hasSubsequence('x', '')"))
    assert(one[Boolean]("hasSubsequenceCaseInsensitive('Garbage', 'ARG')"))
    assert(!one[Boolean]("hasSubsequenceCaseInsensitive('Garbage', 'xyz')"))
    assert(one[Boolean]("hasSubsequenceUTF8('déjà-vu', 'dév')"))
  }

  test("bitSlice selects 1-based bit runs, repacked left-aligned") {
    // 'A' = 0x41 = 01000001; bits 2..3 = "10" → packed 10000000 = 0x80
    assert(one[Array[Byte]]("bitSlice('A', 2, 2)").toSeq == Seq(0x80.toByte))
    // full byte from offset 1
    assert(one[Array[Byte]]("bitSlice('A', 1, 8)").toSeq == Seq(0x41.toByte))
    // no length → to the end
    assert(one[Array[Byte]]("bitSlice('AB', 9)").toSeq == Seq(0x42.toByte))
    // negative offset: last 8 bits of 'AB' = 'B'
    assert(one[Array[Byte]]("bitSlice('AB', -8)").toSeq == Seq(0x42.toByte))
    // negative length: everything except the last 8 bits
    assert(one[Array[Byte]]("bitSlice('AB', 1, -8)").toSeq == Seq(0x41.toByte))
    // out-of-range offset → empty
    assert(one[Array[Byte]]("bitSlice('A', 99)").isEmpty)
  }

  test("arrayLevenshteinDistance over int and string arrays") {
    assert(one[Long]("arrayLevenshteinDistance(array(1,2,3,4), array(1,3,2,4))") == 2L)
    assert(one[Long]("arrayLevenshteinDistance(array('a','b'), array('a','b'))") == 0L)
    assert(one[Long]("arrayLevenshteinDistance(array('a'), array())") == 1L)
    assert(one[Long]("arrayLevenshteinDistance(array(1,2), array(2,1,1))") == 2L)
  }

  // ---- snowflake-ID trio (unix epoch) and the type defaults

  test("generateSnowflakeID round-trips through snowflakeIDToDateTime") {
    val df = spark.sql(
      """SELECT generateSnowflakeID() AS id,
                snowflakeIDToDateTime(generateSnowflakeID()) AS ts,
                current_timestamp() AS now""")
    val r = df.collect().head
    assert(r.getLong(0) > 0)
    val delta = math.abs(r.getTimestamp(1).getTime - r.getTimestamp(2).getTime)
    assert(delta < 5000, s"snowflake timestamp within the query's moment (off by $delta ms)")
    // distinct per row within one query
    val ids = spark.range(100).selectExpr("generateSnowflakeID() AS id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == 100)
    // dateTimeToSnowflakeID inverts the timestamp part
    assert(one[Boolean]("snowflakeIDToDateTime(dateTimeToSnowflakeID(timestamp'2026-01-01 00:00:00')) = timestamp'2026-01-01 00:00:00'"))
  }

  test("defaultValueOfArgumentType / defaultValueOfTypeName") {
    assert(one[Int]("defaultValueOfArgumentType(cast(7 AS INT))") == 0)
    assert(one[String]("defaultValueOfArgumentType('x')") == "")
    assert(one[Long]("defaultValueOfTypeName('UInt64')") == 0L)
    assert(one[String]("defaultValueOfTypeName('String')") == "")
    assert(one[java.sql.Date]("defaultValueOfTypeName('Date')").toString == "1970-01-01")
    assert(seqOf[Long]("defaultValueOfArgumentType(array(1,2))").isEmpty)
  }

  test("formatRow / formatRowNoNewline for CSV, TSV, Values") {
    assert(one[String]("formatRowNoNewline('CSV', 'a,\"b', 7)") == "\"a,\"\"b\",7")
    assert(one[String]("formatRow('CSV', 'x', 1)") == "\"x\",1\n")
    assert(one[String]("formatRowNoNewline('TSV', 'a\tb', 2)") == "a\\tb\t2")
    assert(one[String]("formatRowNoNewline('Values', 'o''k', 3)") == "('o\\'k',3)")
    val e = intercept[Exception](spark.sql("SELECT formatRow('JSONEachRow', 1)").collect())
    assert(e.getMessage.contains("toJSONString") || e.getCause.getMessage.contains("toJSONString"))
  }

  test("makeDate32 / sparkBar / hasSubsequence dialect aliases resolve") {
    assert(one[java.sql.Date]("makeDate32(2026, 2, 14)").toString == "2026-02-14")
    val bar = spark.sql(
      "SELECT sparkBar(4)(x, y) AS v FROM (SELECT id AS x, id * 1.0 AS y FROM range(8))")
      .collect().head.getString(0)
    assert(bar.nonEmpty)
  }

  test("clamp / generate_series / tupleToNameValuePairs / sipHash64Keyed") {
    assert(one[Int]("clamp(7, 1, 5)") == 5)
    assert(one[Int]("clamp(-3, 1, 5)") == 1)
    assert(one[Int]("clamp(3, 1, 5)") == 3)
    // inclusive stop (CH contract), optional step, CH column name
    assert(seqOf[Long]("collect_list(generate_series) FROM (SELECT * FROM generate_series(2, 6) ORDER BY generate_series)") ==
      Seq(2L, 3L, 4L, 5L, 6L))
    assert(seqOf[Long]("collect_list(generate_series) FROM (SELECT * FROM generateSeries(0, 10, 5) ORDER BY generate_series)") ==
      Seq(0L, 5L, 10L))
    val pairs = spark.sql(
      "SELECT tupleToNameValuePairs(named_struct('a', 1, 'b', 2)) AS v")
      .selectExpr("transform(v, p -> concat(p.col1, '=', p.col2)) AS s")
      .collect().head.getSeq[String](0)
    assert(pairs == Seq("a=1", "b=2"))
    // key (0, 0) must reproduce the unkeyed wire value
    assert(one[Boolean]("sipHash64Keyed(tuple(CAST(0 AS BIGINT), CAST(0 AS BIGINT)), 'abc') = sipHash64('abc')"))
    // a different key must not
    assert(one[Boolean]("sipHash64Keyed(tuple(CAST(1 AS BIGINT), CAST(2 AS BIGINT)), 'abc') != sipHash64('abc')"))
    def msg(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def all(t: Throwable): String = if (t == null) "" else t.getMessage + all(t.getCause)
      all(e)
    }
    assert(msg("SELECT sipHash64Keyed(tuple(1L, 2L), 'a', 'b')").contains("one message"))
    assert(msg("SELECT BLAKE3('x')").contains("native"))
  }

  test("covarSampMatrix / quantilesGK / arrayFirstOrNull family / toYYYYMMDDhhmmss") {
    val m = spark.sql(
      """SELECT covarSampMatrix(x, y) AS m FROM
         (SELECT id * 1.0 AS x, id * 2.0 AS y FROM range(5))""")
      .selectExpr("CAST(round(m[0][1], 4) AS DOUBLE) AS c").collect().head.getDouble(0)
    assert(m == 5.0) // covar_samp(x, 2x) over 0..4 = 2 * var_samp = 5
    val qs = spark.sql(
      "SELECT quantilesGK(100, 0.25, 0.75)(CAST(id AS DOUBLE)) AS q FROM range(101)")
      .collect().head.getSeq[Double](0)
    assert(qs.length == 2 && qs.head <= qs.last && qs.head >= 20 && qs.last <= 80)
    assert(one[Int]("arrayFirstOrNull(x -> x > 1, array(1, 2, 3))") == 2)
    assert(spark.sql("SELECT arrayFirstOrNull(x -> x > 9, array(1)) AS v").collect().head.isNullAt(0))
    assert(one[Int]("arrayLastOrNull(x -> x > 1, array(1, 2, 3))") == 3)
    assert(one[String]("toYYYYMMDDhhmmss(timestamp'2026-02-14 13:45:09')") == "20260214134509")
  }

  test("multiplyDecimal / divideDecimal scales; interval tuples; hasColumnInTable") {
    assert(one[java.math.BigDecimal]("multiplyDecimal(CAST(2.5 AS DECIMAL(10,2)), CAST(4.2 AS DECIMAL(10,2)))")
      .compareTo(new java.math.BigDecimal("10.50")) == 0)
    assert(one[java.math.BigDecimal]("divideDecimal(CAST(1 AS DECIMAL(10,1)), CAST(3 AS DECIMAL(10,1)), 4)")
      .compareTo(new java.math.BigDecimal("0.3333")) == 0)
    assert(one[java.sql.Date](
      "CAST(addTupleOfIntervals(date'2026-01-01', tuple(toIntervalDay(1), toIntervalMonth(1))) AS DATE)")
      .toString == "2026-02-02")
    assert(one[java.sql.Date](
      "CAST(subtractTupleOfIntervals(date'2026-02-02', tuple(toIntervalDay(1), toIntervalMonth(1))) AS DATE)")
      .toString == "2026-01-01")
    spark.sql("CREATE OR REPLACE TEMP VIEW hcit_v AS SELECT 1 AS a, 'x' AS b")
    assert(one[Boolean]("hasColumnInTable('default', 'hcit_v', 'a')"))
    assert(!one[Boolean]("hasColumnInTable('default', 'hcit_v', 'zz')"))
    val e = intercept[Exception](spark.sql("SELECT hasColumnInTable('default', 'no_such_t_42', 'a')").collect())
    assert(e.getMessage.contains("no_such_t_42") || (e.getCause != null))
  }

  test("round-12 refusals name their replacement") {
    for ((fn, hint) <- Seq(
        "detectLanguage('x')" -> "langId",
        "stem('en', 'x')" -> "dimension",
        "lemmatize('en', 'x')" -> "dimension",
        "synonyms('s', 'x')" -> "dimension",
        "transactionID()" -> "commit",
        "dictGetAll('d', 'a', 'k')" -> "JOIN",
        "polygonsIntersectionCartesian(readWKTPolygon('POLYGON((0 0,1 0,1 1,0 0))'), readWKTPolygon('POLYGON((0 0,1 0,1 1,0 0))'))" -> "natively")) {
      val e = intercept[Exception](spark.sql(s"SELECT $fn").collect())
      def all(t: Throwable): String =
        if (t == null) "" else t.getMessage + all(t.getCause)
      assert(all(e).contains(hint), s"$fn should refuse mentioning '$hint'")
    }
  }
}
