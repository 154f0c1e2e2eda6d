package graft

/** Sixth round-7 widening wave: explicit-format datetime parsing,
  * dateTrunc/toWeek/toYearWeek, field-change and unit-add datetime
  * surgery, accurateCast family, token/alpha splitters, hasToken,
  * vector normalize/sum, arrayShingles. */
class DialectRound7fSpec extends SparkSpec {

  private def s(sql: String): String =
    spark.sql(s"SELECT $sql AS v").head().getString(0)
  private def i(sql: String): Int =
    spark.sql(s"SELECT $sql AS v").head().getInt(0)
  private def ts(sql: String): String =
    spark.sql(s"SELECT $sql AS v").head().getTimestamp(0).toInstant.toString

  test("parseDateTime / dateTrunc / makeDateTime64 / toStartOfMillisecond") {
    assert(ts("parseDateTime('2024-05-06 07:08:09', 'yyyy-MM-dd HH:mm:ss')")
      == "2024-05-06T07:08:09Z")
    assert(ts("parseDateTime32BestEffort('2024-05-06T07:08:09')") == "2024-05-06T07:08:09Z")
    assert(ts("dateTrunc('month', timestamp'2024-05-06 07:08:09')") == "2024-05-01T00:00:00Z")
    assert(ts("makeDateTime64(2024, 5, 6, 7, 8, 9)") == "2024-05-06T07:08:09Z")
    assert(ts("toStartOfMillisecond(timestamp'2024-05-06 07:08:09.123456')")
      == "2024-05-06T07:08:09.123Z")
    assert(ts("toStartOfMicrosecond(timestamp'2024-05-06 07:08:09.123456')")
      == "2024-05-06T07:08:09.123456Z")
    assert(s("formatDateTimeInJodaSyntax(timestamp'2024-05-06 07:08:09', 'yyyy/MM/dd')")
      == "2024/05/06")
    assert(s("fromUnixTimestampInJodaSyntax(86400, 'yyyy-MM-dd HH')") == "1970-01-02 00")
  }

  test("toWeek/toYearWeek: MySQL mode 0 and ISO mode 3") {
    // 2000-01-01 was a Saturday: week 0 in mode 0, yearweek 199952
    assert(i("toWeek(date'2000-01-01')") == 0)
    assert(i("toYearWeek(date'2000-01-01')") == 199952)
    // first Sunday of 2000 was Jan 2 → week 1
    assert(i("toWeek(date'2000-01-02')") == 1)
    assert(i("toYearWeek(date'2000-01-02')") == 200001)
    // ISO mode 3: 2000-01-01 belongs to ISO week 52 of 1999
    assert(i("toWeek(date'2000-01-01', 3)") == 52)
    assert(i("toYearWeek(date'2000-01-01', 3)") == 199952)
    // a mid-year check: 2024-05-08 (Wed) → mode 0 week 18
    assert(i("toWeek(date'2024-05-08')") == 18)
    val e = intercept[Exception](spark.sql("SELECT toWeek(date'2024-05-08', 7)").collect())
    assert(e.getMessage.contains("mode 7"))
  }

  test("changeYear…changeSecond recompose one field") {
    assert(ts("changeYear(timestamp'2024-05-06 07:08:09', 2020)") == "2020-05-06T07:08:09Z")
    assert(ts("changeMonth(timestamp'2024-05-06 07:08:09', 12)") == "2024-12-06T07:08:09Z")
    assert(ts("changeDay(timestamp'2024-05-06 07:08:09', 28)") == "2024-05-28T07:08:09Z")
    assert(ts("changeHour(timestamp'2024-05-06 07:08:09', 0)") == "2024-05-06T00:08:09Z")
    assert(ts("changeMinute(timestamp'2024-05-06 07:08:09', 59)") == "2024-05-06T07:59:09Z")
    assert(ts("changeSecond(timestamp'2024-05-06 07:08:09.5', 1)") == "2024-05-06T07:08:01Z")
  }

  test("dateAdd/dateSub/addDate/subDate unit arithmetic") {
    // quoted CH units route through the parser rewrite…
    assert(ts("dateAdd('month', 3, timestamp'2024-01-31 10:00:00')") == "2024-04-30T10:00:00Z")
    assert(ts("dateAdd('quarter', 1, timestamp'2024-01-15 00:00:00')") == "2024-04-15T00:00:00Z")
    assert(ts("timestampAdd('hour', 25, timestamp'2024-01-01 00:00:00')") == "2024-01-02T01:00:00Z")
    assert(ts("dateSub('week', 2, timestamp'2024-01-15 12:00:00')") == "2024-01-01T12:00:00Z")
    // …and the unquoted spelling still parses in Spark's own grammar
    assert(ts("dateAdd(MONTH, 1, timestamp'2024-01-15 00:00:00')") == "2024-02-15T00:00:00Z")
    assert(ts("addDate(timestamp'2024-01-01 00:00:00', INTERVAL 90 MINUTE)") == "2024-01-01T01:30:00Z")
    assert(ts("subDate(timestamp'2024-01-01 02:00:00', INTERVAL 1 DAY)") == "2023-12-31T02:00:00Z")
  }

  test("accurateCast family: strict, OrNull, OrDefault") {
    assert(spark.sql("SELECT accurateCast('42', 'Int64') AS v").head().getLong(0) == 42L)
    assert(spark.sql("SELECT accurateCastOrNull('nope', 'Int64') AS v").head().isNullAt(0))
    assert(spark.sql("SELECT accurateCastOrDefault('nope', 'Int64') AS v").head().getLong(0) == 0L)
    assert(spark.sql("SELECT accurateCastOrDefault('nope', 'Float64', 2.5) AS v").head().getDouble(0) == 2.5)
    assert(spark.sql("SELECT toBool(1) AS v").head().getBoolean(0))
    val e = intercept[Exception](spark.sql("SELECT accurateCast('x', 'Int64') AS v").collect())
    assert(e != null) // strict cast throws on garbage
  }

  test("splitters and token search") {
    assert(spark.sql("SELECT splitByNonAlpha('one2two three!') AS v").head().getSeq[String](0)
      == Seq("one", "two", "three"))
    assert(spark.sql("SELECT splitByAlpha('12ab34cd56') AS v").head().getSeq[String](0)
      == Seq("12", "34", "56"))
    def b(sql: String): Boolean = spark.sql(s"SELECT $sql AS v").head().getBoolean(0)
    assert(b("hasToken('select count from t', 'count')"))
    assert(!b("hasToken('discount rates', 'count')"))
    assert(b("hasToken('a+count+b', 'count')"))
    assert(!b("hasToken('accountant', 'count')"))
    assert(spark.sql("SELECT hasTokenOrNull('x', 'a b') AS v").head().isNullAt(0))
  }

  test("vector normalize/sum/difference and arrayShingles") {
    val r = spark.sql(
      """SELECT normalizeL1(array(1.0D, -3.0D)) AS n1,
                normalizeL2(array(3.0D, 4.0D)) AS n2,
                vectorSum(array(1.0D, 2.0D), array(10.0D, 20.0D)) AS vs,
                vectorDifference(array(5.0D, 7.0D), array(1.0D, 2.0D)) AS vd,
                arrayShingles(array(1, 2, 3, 4), 3) AS sh""").head()
    assert(r.getSeq[Double](0) == Seq(0.25, -0.75))
    assert(r.getSeq[Double](1) == Seq(0.6, 0.8))
    assert(r.getSeq[Double](2) == Seq(11.0, 22.0))
    assert(r.getSeq[Double](3) == Seq(4.0, 5.0))
    assert(r.getSeq[Seq[Int]](4) == Seq(Seq(1, 2, 3), Seq(2, 3, 4)))
    // UTF8 aliases agree with their base spellings
    assert(spark.sql(
      "SELECT stringJaccardIndexUTF8('abc', 'bcd') AS a, stringJaccardIndex('abc', 'bcd') AS b")
      .head().let(x => x.getDouble(0) == x.getDouble(1)))
  }

  private implicit class LetOps[A](private val a: A) {
    def let[B](f: A => B): B = f(a)
  }

  test("sub-second arithmetic/components, packed-digit constructors, timeDiff") {
    val r = spark.sql(
      """SELECT toMillisecond(timestamp'2024-05-06 07:08:09.123456') AS ms,
                toMicrosecond(timestamp'2024-05-06 07:08:09.123456') AS us,
                subtractMilliseconds(timestamp'2024-05-06 00:00:00.500', 300) AS sub_ms,
                addNanoseconds(timestamp'2024-05-06 00:00:00', 2500) AS add_ns,
                YYYYMMDDToDate(20240506) AS d,
                YYYYMMDDhhmmssToDateTime(20240506070809) AS dt,
                timeDiff(timestamp'2024-05-06 00:00:00', timestamp'2024-05-06 00:01:30') AS td,
                toModifiedJulianDayOrNull('not-a-date') AS mjn,
                toModifiedJulianDayOrNull('1858-11-17') AS mj0""").head()
    assert(r.getInt(0) == 123 && r.getInt(1) == 123456)
    assert(r.getTimestamp(2).toInstant.toString == "2024-05-06T00:00:00.200Z")
    assert(r.getTimestamp(3).toInstant.toString == "2024-05-06T00:00:00.000002Z")
    assert(r.getDate(4).toString == "2024-05-06")
    assert(r.getTimestamp(5).toInstant.toString == "2024-05-06T07:08:09Z")
    assert(r.getLong(6) == 90L)
    assert(r.isNullAt(7) && r.getLong(8) == 0L)
  }
}
