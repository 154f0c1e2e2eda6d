package graft

/** Seventh round-7 widening wave: fixed-string codecs, digit/decimal
  * formatting, parseTimeDelta, normalizeQuery family, tuple/vector
  * tail, WKT points, sumMap overflow aliases, and the loud-refusal
  * set for geobase/H3/DNS/block-scoped names. */
class DialectRound7gSpec extends SparkSpec {

  private def s(sql: String): String =
    spark.sql(s"SELECT $sql AS v").head().getString(0)
  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql AS v").head().getDouble(0)

  test("toFixedString/toStringCutToZero round trip through NUL padding") {
    assert(spark.sql("SELECT length(toFixedString('ab', 5)) AS v").head().getInt(0) == 5)
    assert(s("toStringCutToZero(toFixedString('ab', 5))") == "ab")
    assert(s("toStringCutToZero('plain')") == "plain")
  }

  test("countDigits / toDecimalString") {
    assert(spark.sql("SELECT countDigits(12345) AS v").head().getInt(0) == 5)
    assert(spark.sql("SELECT countDigits(-987) AS v").head().getInt(0) == 3)
    assert(s("toDecimalString(2.5, 3)") == "2.500")
    assert(s("toDecimalString(7, 2)") == "7.00")
  }

  test("parseTimeDelta: CH doc shapes") {
    assert(d("parseTimeDelta('11s+22min')") == 1331.0)
    assert(d("parseTimeDelta('1d 2h 3m 4s')") == 93784.0)
    assert(d("parseTimeDelta('0.5h')") == 1800.0)
    assert(d("parseTimeDelta('2 weeks')") == 1209600.0)
    assert(d("parseTimeDelta('')") == 0.0)
  }

  test("normalizeQuery family and hash stability") {
    assert(s("normalizeQueryKeepNames(\"SELECT x FROM t WHERE a = 5 AND b = 'q'\")")
      == "SELECT x FROM t WHERE a = ? AND b = ?")
    val r = spark.sql(
      """SELECT normalizedQueryHash('SELECT 1') AS a,
                normalizedQueryHash('SELECT 2') AS b,
                normalizedQueryHashKeepNames('SELECT 1') AS c""").head()
    // literals normalize away → all three hashes agree
    assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2))
  }

  test("tuple/vector tail: modulo, hamming, cosineSimilarity, L2SquaredNorm") {
    val r = spark.sql(
      """SELECT tupleModulo(array(7.0D, 9.0D), array(4.0D, 5.0D)) AS tm,
                tupleHammingDistance(array(1, 2, 3), array(1, 9, 3)) AS th,
                cosineSimilarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
                L2SquaredNorm(array(3.0D, 4.0D)) AS sq,
                innerProduct(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ip""").head()
    assert(r.getSeq[Double](0) == Seq(3.0, 4.0))
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 25.0)
    assert(r.getDouble(4) == 11.0)
  }

  test("WKT point format/parse round trip") {
    assert(s("wkt(struct(1.5, -2.25))") == "POINT(1.5 -2.25)")
    val p = spark.sql("SELECT readWKTPoint('POINT(10 -20.5)') AS v").head().getStruct(0)
    assert(p.getDouble(0) == 10.0 && p.getDouble(1) == -20.5)
  }

  test("sumMapFilteredWithOverflow matches sumMapFiltered") {
    val r = spark.sql(
      """SELECT sumMapFiltered(array('a'))(k, v) AS f,
                sumMapFilteredWithOverflow(array('a'))(k, v) AS fo,
                sumMapWithOverflow(k, v) AS so
         FROM VALUES (array('a','b'), array(1L, 10L)), (array('a'), array(5L)) t(k, v)""").head()
    assert(r.getStruct(0) == r.getStruct(1))
    val so = r.getStruct(2)
    assert(so.getSeq[String](0).zip(so.getSeq[Long](1)).toMap == Map("a" -> 6L, "b" -> 10L))
  }

  test("geobase/H3/DNS/block-scoped names refuse loudly") {
    def refusal(sql: String, hint: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage.contains(hint), s"$sql → ${e.getMessage.take(120)}")
    }
    refusal("SELECT regionToCountry(1)", "geobase")
    refusal("SELECT geoToH3(0.0, 0.0, 1)", "geohashEncode")
    refusal("SELECT reverseDNSQuery('1.2.3.4')", "network IO")
    refusal("SELECT lowCardinalityIndices('x')", "dense_rank")
  }

  test("SELECT-list modifiers: bare EXCEPT, REPLACE, count(), :: type casts") {
    spark.sql("SELECT 1 AS a, 2 AS b, 3 AS c").createOrReplaceTempView("mods_t")
    assert(spark.sql("SELECT * EXCEPT b FROM mods_t").columns.toSeq == Seq("a", "c"))
    // REPLACE: replaced column moves to the end (documented), value swapped
    val r = spark.sql("SELECT * REPLACE (a + 10 AS a) FROM mods_t").head()
    val cols = spark.sql("SELECT * REPLACE (a + 10 AS a) FROM mods_t").columns.toSeq
    assert(cols.sorted == Seq("a", "b", "c"))
    assert(r.getInt(cols.indexOf("a")) == 11)
    val two = spark.sql("SELECT * REPLACE (a + 10 AS a, upper('x') AS q) FROM (SELECT 1 AS a, 'y' AS q)").head()
    assert(two.getInt(0) + 0 >= 0) // parses; values:
    assert(spark.sql("SELECT * REPLACE (a + 10 AS a, upper('x') AS q) FROM (SELECT 1 AS a, 'y' AS q)")
      .collect().head.toSeq.toSet == Set(11, "X"))
    assert(spark.sql("SELECT count() FROM mods_t").head().getLong(0) == 1L)
    assert(spark.sql("SELECT 1 :: Int64 AS v").head().getLong(0) == 1L)
    assert(spark.sql("SELECT '3.5' :: Float64 AS v").head().getDouble(0) == 3.5)
  }

  test("conversion widths, replaceRegexpOne, emptyArrayToSingle, scalar bit ops") {
    val r = spark.sql(
      """SELECT toUInt64('7') AS u64, toUInt8(200) AS u8, toInt16(12) AS i16,
                replaceRegexpOne('aXbXc', 'X', '-') AS one,
                replaceRegexpOne('k=1 k=2', 'k=(\\d)', 'v$1') AS grp,
                emptyArrayToSingle(CAST(array() AS ARRAY<INT>)) AS ea,
                emptyArrayToSingle(array(5)) AS ne,
                bitAnd(12, 10) AS ba, bitOr(12, 10) AS bo,
                bitXor(12, 10) AS bx, bitNot(0) AS bn""").head()
    assert(r.getLong(0) == 7L && r.getShort(1) == 200 && r.getShort(2) == 12)
    assert(r.getString(3) == "a-bXc")
    assert(r.getString(4) == "v1 k=2")
    assert(r.getSeq[Any](5) == Seq(null) && r.getSeq[Int](6) == Seq(5))
    assert(r.getLong(7) == 8L && r.getLong(8) == 14L && r.getLong(9) == 6L && r.getLong(10) == -1L)
  }

  test("reinterpret pair round-trips and PASTE JOIN refuses") {
    val r = spark.sql(
      """SELECT reinterpretAsUInt64('abc') AS u,
                reinterpretAsString(reinterpretAsUInt64('hello')) AS rt,
                reinterpretAsUInt8('abc') AS u8""").head()
    // 'abc' little-endian: 0x636261
    assert(r.getLong(0) == 0x636261L)
    assert(r.getString(1) == "hello")
    assert(r.getLong(2) == 0x61L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM a PASTE JOIN b"))
    assert(e.getMessage.contains("row_number"))
  }

  test("PASTE JOIN executes on ORDER BY'd subqueries (deterministic zip)") {
    val r = spark.sql(
      """SELECT * FROM
         (SELECT id AS a, id * 10 AS a10 FROM range(5) ORDER BY a DESC)
         PASTE JOIN
         (SELECT id AS b FROM range(3) ORDER BY b)""").collect()
    // left ordered 4,3,2,1,0; right 0,1,2; inner zip truncates to 3
    assert(r.length == 3)
    val rows = r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._3)
    assert(rows.toSeq == Seq((4L, 40L, 0L), (3L, 30L, 1L), (2L, 20L, 2L)))
    // a side without ORDER BY refuses with the contract in the message
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM (SELECT 1 AS x) PASTE JOIN (SELECT 2 AS y ORDER BY y)"))
    assert(e.getMessage.contains("ORDER BY"))
    // ordinal ORDER BY refuses (a window cannot re-read ordinals)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM (SELECT id AS x FROM range(3) ORDER BY 1) PASTE JOIN (SELECT id AS y FROM range(3) ORDER BY y)"))
    assert(e2.getMessage.contains("ordinal"))
    // parens inside string literals must not unbalance the boundary
    // scans (review finding: ':-)' in a SELECT literal broke them)
    val lit = spark.sql(
      """SELECT * FROM
         (SELECT ':-)' AS face, id AS x FROM range(3) ORDER BY x)
         PASTE JOIN
         (SELECT id AS y FROM range(3) ORDER BY y DESC)""").collect()
    assert(lit.length == 3)
    assert(lit.forall(_.getString(0) == ":-)"))
    assert(lit.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((0L, 2L), (1L, 1L), (2L, 0L)))
  }

  test("* APPLY and COLUMNS('re') expand from the FROM table's schema") {
    import spark.implicits._
    Seq((1L, 2.0, 3L), (4L, 5.0, 6L)).toDF("a_num", "b_val", "c_num")
      .createOrReplaceTempView("apply_t")
    // * APPLY(max): every column aggregated, CH-style result names
    val r = spark.sql("SELECT * APPLY(max) FROM apply_t").head()
    assert(r.getLong(0) == 4L && r.getDouble(1) == 5.0 && r.getLong(2) == 6L)
    assert(spark.sql("SELECT * APPLY(max) FROM apply_t").columns.toSeq ==
      Seq("max(a_num)", "max(b_val)", "max(c_num)"))
    // COLUMNS regex without APPLY: plain projection of the matches
    assert(spark.sql("SELECT COLUMNS('_num$') FROM apply_t").columns.toSeq ==
      Seq("a_num", "c_num"))
    // COLUMNS + APPLY: aggregate just the matches
    val s = spark.sql("SELECT COLUMNS('_num$') APPLY(sum) FROM apply_t").head()
    assert(s.getLong(0) == 5L && s.getLong(1) == 9L)
    // unsupported shapes refuse with the hand-expansion guidance
    val e = intercept[Exception](spark.sql(
      "SELECT * APPLY(sum) FROM (SELECT 1 AS x)"))
    assert(e.getMessage.contains("expanded column list"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT COLUMNS('^nope$') FROM apply_t"))
    assert(e2.getMessage.contains("matches no column"))
    // COLUMNS inside a string literal is data, not syntax
    val lit = spark.sql("SELECT 'use COLUMNS(''x'') here' AS s FROM apply_t LIMIT 1")
      .head().getString(0)
    assert(lit.contains("COLUMNS"))
    // …but a literal mention must not MASK a real matcher after it
    val both = spark.sql(
      "SELECT 'see * APPLY(f)' AS doc, COLUMNS('_num$') FROM apply_t WHERE a_num = 1")
    assert(both.columns.toSeq == Seq("doc", "a_num", "c_num"))
    // JOINed FROM refuses (CH expands over the combined schema)
    val j = intercept[Exception](spark.sql(
      "SELECT * APPLY(max) FROM apply_t JOIN apply_t t2 ON apply_t.a_num = t2.a_num"))
    assert(j.getMessage.contains("more than one table"))
    // a matcher after the select list refuses with guidance too
    val t = intercept[Exception](spark.sql(
      "SELECT a_num FROM apply_t ORDER BY COLUMNS('_num$')"))
    assert(t.getMessage.contains("after the top-level select list"))
    // a broken COLUMNS regex refuses with the dialect message
    val bad = intercept[Exception](spark.sql("SELECT COLUMNS('(') FROM apply_t"))
    assert(bad.getMessage.contains("does not compile"))
    // an identifier containing '_from' must not misdetect FROM
    val idf = spark.sql("SELECT a_num AS id_from, COLUMNS('_num$') FROM apply_t WHERE a_num = 1")
    assert(idf.columns.toSeq == Seq("id_from", "a_num", "c_num"))
  }

  test("two independent PASTE JOINs rewrite; a chained one zips all sides") {
    // one per UNION branch — the recursion must rewrite both
    val two = spark.sql(
      """SELECT * FROM ((SELECT id AS a FROM range(2) ORDER BY a)
                        PASTE JOIN (SELECT id AS b FROM range(2) ORDER BY b DESC))
         UNION ALL
         SELECT * FROM ((SELECT id AS a FROM range(2) ORDER BY a DESC)
                        PASTE JOIN (SELECT id AS b FROM range(2) ORDER BY b))""").collect()
    assert(two.length == 4)
    assert(two.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L), (1L, 0L))) // both branches zip opposite orders
    // chained PASTE JOIN zips ALL sides in one multi-way join —
    // left-to-right pairwise zip semantics, truncating to the
    // shortest side (here: 2 rows; side 3 zips descending)
    val chained = spark.sql(
      """SELECT * FROM (SELECT id AS a FROM range(2) ORDER BY a)
         PASTE JOIN (SELECT id AS b FROM range(2) ORDER BY b)
         PASTE JOIN (SELECT id AS c FROM range(3) ORDER BY c DESC)""").collect()
    assert(chained.length == 2)
    assert(chained.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((0L, 0L, 2L), (1L, 1L, 1L)))
    // a chained side without its own ORDER BY still refuses with the contract
    val bad3 = intercept[Exception](spark.sql(
      """SELECT * FROM (SELECT id AS a FROM range(2) ORDER BY a)
         PASTE JOIN (SELECT id AS b FROM range(2) ORDER BY b)
         PASTE JOIN (SELECT id AS c FROM range(2))"""))
    assert(bad3.getMessage.contains("ORDER BY"))
  }

  test("MAC codecs, basename, unbin, isConstant, shard constants") {
    val r = spark.sql(
      """SELECT MACNumToString(1099511627775) AS mac,
                MACStringToNum(MACNumToString(123456789)) AS rt,
                basename('/a/b/file.txt') AS bn,
                basename('plain') AS bp,
                unbin('0011000000110001') AS ub,
                unbin(bin(65)) AS ub_rt,
                isConstant(1 + 2) AS ic,
                visibleWidth(12345) AS vw,
                shardNum() AS sn, shardCount() AS sc,
                length(queryID()) AS qid""").head()
    assert(r.getString(0) == "00:ff:ff:ff:ff:ff")
    assert(r.getLong(1) == 123456789L)
    assert(r.getString(2) == "file.txt" && r.getString(3) == "plain")
    // CH unbin is bin()'s byte-string inverse, not a numeric parse
    assert(r.getString(4) == "01")
    assert(r.getString(5) == "A")
    assert(r.getBoolean(6))
    assert(r.getInt(7) == 5)
    assert(r.getInt(8) == 1 && r.getInt(9) == 1)
    assert(r.getInt(10) == 36)
    val e = intercept[Exception](spark.sql("SELECT sleep(1)").collect())
    assert(e.getMessage.contains("timing"))
  }

  test("review fixes: RFC 7386 null-drop, fill NULL chain, fraction keep, numbers offset") {
    // RFC 7386: non-object target is replaced by {} first, nulls drop
    val j = spark.sql(
      """SELECT JSONMergePatch('[1,2]', '{"a": null, "b": 2}') AS a,
                JSONMergePatch('{}', '{"a": {"b": null, "c": 1}}') AS b""").head()
    assert(j.getString(0) == """{"b":2}""")
    assert(j.getString(1) == """{"a":{"c":1}}""")
    // a passing NULL element still fills forward
    assert(spark.sql(
      "SELECT arrayFill(x -> x IS NULL, array(CAST(null AS INT), 5)) AS v")
      .head().getSeq[Integer](0) == Seq(null, null))
    // non-second field changes keep the sub-second fraction
    assert(spark.sql(
      "SELECT changeYear(timestamp'2024-05-06 07:08:09.123', 2020) AS v")
      .head().getTimestamp(0).toInstant.toString == "2020-05-06T07:08:09.123Z")
    // system.numbers LIMIT+OFFSET and the comma form bound the range
    assert(spark.sql("SELECT min(number) || ':' || max(number) || ':' || count(*) AS v " +
      "FROM system.numbers LIMIT 10 OFFSET 5").head().getString(0) == "5:14:10")
    assert(spark.sql("SELECT min(number) || ':' || count(*) AS v " +
      "FROM system.numbers LIMIT 3, 4").head().getString(0) == "3:4")
    // implicit Date default analyses and yields the epoch
    assert(spark.sql("SELECT accurateCastOrDefault('nope', 'Date') AS v")
      .head().getDate(0).toString == "1970-01-01")
    // pre-epoch millisecond start floors DOWN
    assert(spark.sql(
      "SELECT toStartOfMillisecond(timestamp'1969-12-31 23:59:59.9995') AS v")
      .head().getTimestamp(0).toInstant.toString == "1969-12-31T23:59:59.999Z")
    // 3+-arg table functions get the guidance, not an opaque error
    val e = intercept[Exception](
      spark.sql("SELECT * FROM s3('s3://b/k', 'KEY', 'SECRET', 'Parquet')"))
    assert(e.getMessage.contains("Hadoop conf"))
  }

  test("WITH FILL INTERPOLATE carries values across filled rows") {
    spark.sql("SELECT * FROM VALUES (1, 10.0D, 100L), (4, 40.0D, 400L) t(x, v, w)")
      .createOrReplaceTempView("wf_src")
    val rows = spark.sql(
      """SELECT x, v, w FROM wf_src
         ORDER BY x WITH FILL FROM 0 TO 6 INTERPOLATE (v)""").collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 5))
    // v carries the last seen value forward; before the first source
    // row the 0 default applies (same as the non-interpolated columns)
    val vs = rows.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    assert(vs == Seq(0.0, 10.0, 10.0, 10.0, 40.0, 40.0))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 100L, 0L, 0L, 400L, 0L))
    // affine AS-form (round 15): each filled row steps from the
    // PREVIOUS row's value — gaps ramp from the last source value
    val ramp = spark.sql(
      """SELECT x, v FROM wf_src
         ORDER BY x WITH FILL FROM 0 TO 6 INTERPOLATE (v AS v + 1)""").collect()
    assert(ramp.map(_.getDouble(1)).toSeq == Seq(0.0, 10.0, 11.0, 12.0, 40.0, 41.0))
    // explicit-carry AS-form equals the bare spelling
    val carry = spark.sql(
      """SELECT x, v FROM wf_src
         ORDER BY x WITH FILL FROM 0 TO 6 INTERPOLATE (v AS v)""").collect()
    assert(carry.map(_.getDouble(1)).toSeq == Seq(0.0, 10.0, 10.0, 10.0, 40.0, 40.0))
    // non-affine AS-expressions stay out of the subset and fail loudly
    val e = intercept[Exception](spark.sql(
      "SELECT x, v, w FROM wf_src ORDER BY x WITH FILL FROM 0 TO 3 INTERPOLATE (v AS w * 2)"))
    assert(e != null)
  }

  test("LIMIT BY per-group offset forms") {
    spark.sql("""SELECT * FROM VALUES ('a', 1), ('a', 2), ('a', 3), ('b', 1), ('b', 2) t(g, v)""")
      .createOrReplaceTempView("lb_src")
    def run(sql: String): Seq[(String, Int)] =
      spark.sql(sql).collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    // skip 1, take 1 per group — both spellings
    assert(run("SELECT g, v FROM lb_src ORDER BY g, v LIMIT 1 OFFSET 1 BY g")
      == Seq(("a", 2), ("b", 2)))
    assert(run("SELECT g, v FROM lb_src ORDER BY g, v LIMIT 1, 1 BY g")
      == Seq(("a", 2), ("b", 2)))
    // no-offset form unchanged
    assert(run("SELECT g, v FROM lb_src ORDER BY g, v LIMIT 2 BY g")
      == Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)))
  }

  test("ClickHouse [..] array literals parse; subscripts stay subscripts") {
    val r = spark.sql(
      """SELECT [1, 2, 3] AS a,
                arraySum([1, 2, 3]) AS s,
                [1, 2, 3][1] AS idx,
                [[1, 2], [3]] AS nested,
                [[1, 2], [3]][0][1] AS chain,
                has([10, 20], 20) AS h,
                ['a', 'b'] AS strs""").head()
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getDouble(1) == 6.0)
    assert(r.getInt(2) == 2)
    assert(r.getSeq[Seq[Int]](3) == Seq(Seq(1, 2), Seq(3)))
    assert(r.getInt(4) == 2)
    assert(r.getBoolean(5))
    assert(r.getSeq[String](6) == Seq("a", "b"))
    // a real column subscript is untouched
    spark.sql("SELECT array(7, 8) AS arr").createOrReplaceTempView("al_t")
    assert(spark.sql("SELECT arr[1] FROM al_t").head().getInt(0) == 8)
    // brackets inside string literals never rewrite
    assert(spark.sql("SELECT '[1,2]' AS s").head().getString(0) == "[1,2]")
    // IN over a literal list
    assert(spark.sql("SELECT 2 IN [1, 2, 3] AS v").head().getBoolean(0))
  }

  test("ClickHouse {..} map literals parse; named parameters untouched") {
    val r = spark.sql(
      """SELECT {'a': 1, 'b': 2} AS m,
                {'k': [1, 2]} AS nested,
                map_keys({'x': 10})[0] AS k1""").head()
    assert(r.getMap[String, Int](0) == Map("a" -> 1, "b" -> 2))
    assert(r.getMap[String, scala.collection.Seq[Int]](1)("k").toSeq == Seq(1, 2))
    assert(r.getString(2) == "x")
    // colons inside string keys/values survive
    assert(spark.sql("SELECT {'a:b': 'c:d'} AS m").head()
      .getMap[String, String](0)("a:b") == "c:d")
    // named parameters ({id:UInt64}) still work through the dialect
    val p = spark.sql("SELECT {n:UInt64} + 1 AS v", Map("n" -> "41")).head()
    assert(p.getLong(0) == 42L)
  }

  test("positional tuple access .N maps to default struct fields") {
    val r = spark.sql(
      """SELECT tuple(7, 'x').1 AS a, tuple(7, 'x').2 AS b,
                (1, (2, 3)).2.1 AS nested,
                1.5D AS dec, 'file.1' AS txt""").head()
    assert(r.getInt(0) == 7 && r.getString(1) == "x")
    assert(r.getInt(2) == 2)
    assert(r.getDouble(3) == 1.5)
    assert(r.getString(4) == "file.1")
  }

  test("second-review fixes: backtick paths, double-quoted strings, nested maps, :: values") {
    // tuple-dot must not corrupt backtick content (file()-rewritten paths)
    val dir = s"/tmp/graft_dot_${java.util.UUID.randomUUID().toString.take(8)}.v1.parquet"
    spark.range(3).write.parquet(dir)
    assert(spark.sql(s"SELECT count(*) FROM file('$dir', 'Parquet')").head().getLong(0) == 3L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    // double-quoted strings are literals under Spark defaults - inert
    val dq = spark.sql("""SELECT '[1]' = "[1]" AS eq, "{'a': 1}" AS m, "v.1" AS t""").head()
    assert(dq.getBoolean(0) && dq.getString(1) == "{'a': 1}" && dq.getString(2) == "v.1")
    // backslash-escaped quotes inside array literals
    assert(spark.sql("""SELECT ['don\'t', 'b'] AS a""").head().getSeq[String](0)
      == Seq("don't", "b"))
    // nested map literals and ::-cast values
    val nm = spark.sql("""SELECT {'a': {'b': 1}} AS nested, {'k': 1 :: Int64} AS cast_v""").head()
    assert(nm.getMap[String, Map[String, Int]](0)("a") == Map("b" -> 1))
    assert(nm.getMap[String, Long](1)("k") == 1L)
    // INTERPOLATE of an unselected column fails loudly
    spark.sql("SELECT 1 AS x, 2 AS v").createOrReplaceTempView("wf_g")
    val e = intercept[Exception](spark.sql(
      "SELECT x, v FROM wf_g ORDER BY x WITH FILL FROM 0 TO 3 INTERPOLATE (w)"))
    assert(e != null)
  }

  test("spelling variants: singular minute buckets, RFC domains, CI multi-positions") {
    val r = spark.sql(
      """SELECT toStartOfFiveMinute(timestamp'2024-05-06 07:08:09') AS m5,
                toStartOfFiveMinutes(timestamp'2024-05-06 07:08:09') AS m5s,
                domainRFC('https://ex.com/a') AS d,
                topLevelDomainRFC('https://ex.co.uk/a') AS tld,
                multiSearchAllPositionsCaseInsensitive('Hello World', array('WORLD', 'x')) AS pos""").head()
    assert(r.getTimestamp(0) == r.getTimestamp(1))
    assert(r.getString(2) == "ex.com" && r.getString(3) == "uk")
    assert(r.getSeq[Int](4) == Seq(7, 0))
  }

  test("formatDateTime/parseDateTime %-codes translate; variadic caseWithExpression") {
    // the CH/MySQL %-syntax a migrated estate actually writes
    val f = spark.sql(
      """SELECT formatDateTime(toDateTime('2024-01-02 03:04:05'), '%Y-%m-%d %H:%i:%S') AS a,
                formatDateTime(toDate('2024-03-07'), '%W, %e %b %y') AS b,
                formatDateTime(toDateTime('2024-01-02 13:04:05'), '%l %p') AS c,
                formatDateTime(toDateTime('2024-01-02 03:04:05'), '100%% %F') AS d""").head()
    assert(f.getString(0) == "2024-01-02 03:04:05")
    assert(f.getString(1) == "Thursday, 7 Mar 24")
    assert(f.getString(2) == "1 PM")
    assert(f.getString(3) == "100% 2024-01-02")
    // %-free literals keep the pre-round-11 Java-pattern behavior
    assert(spark.sql("SELECT formatDateTime(toDate('2024-03-07'), 'yyyy/MM') AS x")
      .head().getString(0) == "2024/03")
    assert(spark.sql(
      "SELECT parseDateTime('2024-01-02 03:04:05', '%Y-%m-%d %H:%i:%S') AS p").head()
      .getTimestamp(0).toString.startsWith("2024-01-02 03:04:05"))
    // week-based-only codes refuse with guidance instead of Spark's
    // cross-version pattern error
    val e = intercept[Exception](
      spark.sql("SELECT formatDateTime(toDate('2024-03-07'), '%V')").collect())
    assert(e.getMessage.contains("toISOWeek"))
    // variadic CASE-expression form + the 4-arg array remap coexist
    val c = spark.sql(
      """SELECT caseWithExpression('b', 'a', 1, 'b', 2, 0) AS hit,
                caseWithExpression('z', 'a', 1, 'b', 2, 42) AS dflt,
                caseWithExpression(2, [1, 2], ['x', 'y'], 'z') AS remap""").head()
    assert(c.getInt(0) == 2 && c.getInt(1) == 42 && c.getString(2) == "y")
    // untuple refuses with the aliased-subquery spelling
    val e2 = intercept[Exception](spark.sql("SELECT untuple(tuple(1, 2))"))
    assert(e2.getMessage.contains("t.*") || e2.getMessage.contains("u.*"))
  }

  test("JSONExtractArrayRaw, mapApply, map-form mapPopulateSeries, timestamp_diff") {
    val r1 = spark.sql("""SELECT JSONExtractArrayRaw('[{"a":1},{"a":2}]') AS raw,
                                 JSONExtractArrayRaw('[1,"x",true]') AS mix,
                                 JSONExtractArrayRaw('{"not":"array"}') AS na""").head()
    assert(r1.getSeq[String](0) == Seq("""{"a":1}""", """{"a":2}"""))
    // string scalars stay QUOTED — raw JSON text, not the unquoted value
    assert(r1.getSeq[String](1) == Seq("1", "\"x\"", "true"))
    assert(r1.getSeq[String](2).isEmpty) // non-array degrades to []
    // per-element follow-up extraction — the idiom ArrayRaw exists for
    val ext = spark.sql(
      """SELECT transform(JSONExtractArrayRaw('[{"a":1},{"a":5}]'),
                          x -> JSONExtractInt(x, 'a')) AS vs""").head()
    assert(ext.getSeq[Long](0) == Seq(1L, 5L))
    // CH's map form of the series densifier returns a MAP
    val r2 = spark.sql("SELECT mapPopulateSeries(map(1, 10, 4, 40)) AS m").head()
    assert(r2.getMap[Long, Int](0) == Map(1L -> 10, 2L -> 0, 3L -> 0, 4L -> 40))
    // mapApply rewrites keys AND values through one entries pass
    val r3 = spark.sql(
      "SELECT mapApply((k, v) -> tuple(concat(k, '!'), v * 2), map('a', 1, 'b', 2)) AS m").head()
    assert(r3.getMap[String, Int](0) == Map("a!" -> 2, "b!" -> 4))
    // the type argument is required, loudly (CH semantics)
    val e = intercept[Exception](
      spark.sql("""SELECT JSONExtractKeysAndValues('{"a":1}')"""))
    assert(e.getMessage.contains("value type"))
    // timestamp_diff spells dateDiff's boundary-crossing semantics
    assert(spark.sql(
      """SELECT timestamp_diff('hour', toDateTime('2024-01-01 00:00:00'),
                               toDateTime('2024-01-02 03:00:00')) AS d""").head().getLong(0) == 27L)
  }

  test("vector functions take any numeric arrays; IPv4 helpers accept numeric form") {
    // decimal literals ([1.0, 2.0] parses as array<decimal>) and int
    // arrays flow through the same codegen'd dot kernel — no CAST
    // ceremony for the SQL console user
    val r = spark.sql(
      """SELECT cosineDistance([1.0, 0.0], [0.0, 1.0]) AS cd,
                dotProduct([1, 2, 3], [4, 5, 6]) AS dp,
                L2Distance([0.0, 0.0], [3.0, 4.0]) AS l2,
                L1Normalize([1.0, 3.0]) AS n1,
                L2Normalize([3.0, 4.0]) AS n2""").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 32.0 && r.getDouble(2) == 5.0)
    assert(r.getSeq[Double](3) == Seq(0.25, 0.75))
    assert(r.getSeq[Double](4) == Seq(0.6, 0.8))
    // CIDR range accepts the numeric IPv4 CH produces from
    // IPv4StringToNum as well as the dotted string
    val c = spark.sql(
      """SELECT IPv4CIDRToRange(IPv4StringToNum('192.168.5.2'), 16) AS a,
                IPv4CIDRToRange('192.168.5.2', 16) AS b""").head()
    assert(c.getStruct(0).getString(0) == "192.168.0.0")
    assert(c.getStruct(0).getString(1) == "192.168.255.255")
    assert(c.getStruct(0) == c.getStruct(1))
    assert(spark.sql("SELECT hasTokenCaseInsensitive('a B c', 'b') AS t").head().getBoolean(0))
    // CH truncate rounds TOWARD ZERO (floor alone would send
    // -3.78 → -3.8); bare `trunc` stays Spark's date function
    val tr = spark.sql(
      "SELECT truncate(3.789, 1) AS a, truncate(-3.789, 1) AS b, truncate(7.9) AS c").head()
    assert(tr.getDouble(0) == 3.7 && tr.getDouble(1) == -3.7 && tr.getDouble(2) == 7.0)
  }

  test("statement idioms: LIMIT o,n / TRUNCATE IF EXISTS / wide casts / LIMIT BY unprojected") {
    spark.range(10).selectExpr("id AS a", "CAST(id % 3 AS INT) AS g")
      .createOrReplaceTempView("idi_t")
    // MySQL-style top-level LIMIT offset, count
    assert(spark.sql("SELECT a FROM idi_t ORDER BY a LIMIT 2, 3").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // LIMIT BY on a column the SELECT list does not carry (CH allows
    // it; the by-columns inject into the inner projection)
    assert(spark.sql("SELECT a FROM idi_t ORDER BY a LIMIT 1 BY g").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // TRUNCATE IF EXISTS: missing table is a no-op, existing truncates
    spark.sql("TRUNCATE TABLE IF EXISTS no_such_idi_table")
    spark.sql("DROP TABLE IF EXISTS idi_real")
    spark.sql("CREATE TABLE idi_real (x UInt32) ENGINE = Memory")
    spark.sql("INSERT INTO idi_real VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE IF EXISTS idi_real")
    assert(spark.table("idi_real").count() == 0L)
    spark.sql("DROP TABLE idi_real")
    // expression-level CH type casts added round 11
    val c = spark.sql(
      """SELECT CAST('2024-01-05' AS Date32) AS d,
                CAST(1 AS Int256) AS big,
                CAST('a' AS Enum('a' = 1, 'b' = 2)) AS e,
                1::Date32 IS NOT NULL AS dc""".stripMargin.replace("1::Date32 IS NOT NULL AS dc",
                  "CAST('2024-01-05' AS Date32) IS NOT NULL AS dc")).head()
    assert(c.getDate(0).toString == "2024-01-05")
    assert(c.getDecimal(1).longValue == 1L)
    assert(c.getString(2) == "a")
    // toUUIDOrNull/toUUIDOrZero
    val u = spark.sql(
      """SELECT toUUIDOrNull('bad') AS n,
                toUUIDOrNull('61F0C404-5CB3-11E7-907B-A6006AD3DBA0') AS ok,
                toUUIDOrZero('bad') AS z""").head()
    assert(u.isNullAt(0))
    assert(u.getString(1) == "61f0c404-5cb3-11e7-907b-a6006ad3dba0")
    assert(u.getString(2) == "00000000-0000-0000-0000-000000000000")
  }

  test("AES encrypt/decrypt round-trip; base64URL; SHA widths; rand family") {
    // ECB round-trips (bit-exact CH interop: no IV in either layout);
    // GCM round-trips in the engine's own iv-in-payload layout
    val r = spark.sql(
      """SELECT decrypt('aes-128-ecb', encrypt('aes-128-ecb', 'secret text', '0123456789abcdef'),
                        '0123456789abcdef') AS ecb,
                decrypt('aes-256-gcm', encrypt('aes-256-gcm', 'hi', '0123456789abcdef0123456789abcdef'),
                        '0123456789abcdef0123456789abcdef') AS gcm,
                tryDecrypt('aes-128-ecb', unhex('00'), '0123456789abcdef') AS bad""").head()
    assert(r.getString(0) == "secret text")
    assert(r.getString(1) == "hi")
    assert(r.isNullAt(2)) // tryDecrypt degrades to NULL, never throws
    // wrong key LENGTH for the declared bits fails loudly
    intercept[Exception](spark.sql(
      "SELECT encrypt('aes-256-ecb', 'x', 'short')").collect())
    // explicit IV refuses with the layout contract
    val e = intercept[Exception](spark.sql(
      "SELECT encrypt('aes-128-cbc', 'x', '0123456789abcdef', 'iviviviviviviviv')"))
    assert(e.getMessage.contains("IV"))
    // URL-safe base64 round-trips and differs from plain at +//
    val b = spark.sql(
      """SELECT toBase64URL(unhex('FBFF')) AS url, base64(unhex('FBFF')) AS plain,
                fromBase64URL(toBase64URL('a?b')) AS rt""").head()
    assert(b.getString(0) == "-_8=" && b.getString(1) == "+/8=")
    assert(b.getString(2) == "a?b")
    assert(spark.sql("SELECT SHA224('abc') AS h").head().getString(0).length == 56 / 2 * 2)
    val rnd = spark.sql(
      "SELECT randCanonical() AS c, CAST(randBernoulli(1.0) AS BIGINT) AS one, CAST(randBernoulli(0.0) AS BIGINT) AS zero").head()
    assert(rnd.getDouble(0) >= 0.0 && rnd.getDouble(0) < 1.0)
    assert(rnd.getLong(1) == 1L && rnd.getLong(2) == 0L)
    // block-order runningConcurrency refuses with the window spelling
    val e2 = intercept[Exception](spark.sql("SELECT runningConcurrency(1, 2)"))
    assert(e2.getMessage.contains("OVER"))
  }

  test("tuple spellings of the vector family; JSONArrayLength; ML-evaluator refusals") {
    val r = spark.sql(
      """SELECT dotProduct(tuple(1, 2), tuple(3, 4)) AS dp,
                L2Distance(tuple(0.0, 0.0), tuple(3.0, 4.0)) AS l2,
                cosineSimilarity(tuple(1.0, 0.0), tuple(1.0, 0.0)) AS cs,
                JSONArrayLength('[1,2,3]') AS n,
                JSONArrayLength('{}') AS nn""").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 1.0)
    assert(r.getInt(3) == 3 && r.isNullAt(4))
    for ((fn, hint) <- Seq("evalMLMethod(1.0)" -> "offline",
                           "catboostEvaluate('m', 1.0)" -> "CatBoost",
                           "formatQuery('select 1')" -> "normalizeQuery")) {
      val e = intercept[Exception](spark.sql(s"SELECT $fn"))
      assert(e.getMessage.contains(hint), s"$fn -> ${e.getMessage.take(80)}")
    }
  }

  test("lambda arraySort, leadInFrame frame, firstValue, topKIf, extractAllGroups") {
    // CH sort-by-key lambdas
    val s = spark.sql(
      """SELECT arraySort(x -> -x, [1, 3, 2]) AS a,
                arrayReverseSort(x -> length(x), ['bbb', 'a', 'cc']) AS b,
                arraySort([3, 1, 2]) AS plain""").head()
    assert(s.getSeq[Int](0) == Seq(3, 2, 1))
    assert(s.getSeq[String](1) == Seq("bbb", "cc", "a"))
    assert(s.getSeq[Int](2) == Seq(1, 2, 3))
    // the documented CH spelling with the UNBOUNDED frame executes;
    // on frames lead/lag can't honor it still fails
    spark.range(5).selectExpr("id", "id * 2 AS v").createOrReplaceTempView("lif_t")
    val w = spark.sql(
      """SELECT id, leadInFrame(v) OVER (ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nxt,
              lagInFrame(v, 1, CAST(-1 AS BIGINT)) OVER (ORDER BY id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS prv
         FROM lif_t ORDER BY id""").collect()
    assert(w.map(r => if (r.isNullAt(1)) -99L else r.getLong(1)).toSeq == Seq(2L, 4L, 6L, 8L, -99L))
    assert(w.map(_.getLong(2)).toSeq == Seq(-1L, 0L, 2L, 4L, 6L))
    intercept[Exception](spark.sql(
      """SELECT leadInFrame(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         FROM lif_t""").collect())
    // firstValue/lastValue aliases + the topK -If combinator
    val f = spark.sql(
      """SELECT firstValue(v) AS fv, lastValue(v) AS lv,
                topKIf(2)(id % 3, v >= 4) AS tk
         FROM (SELECT id, v FROM lif_t ORDER BY id)""").head()
    assert(f.getLong(0) == 0L && f.getLong(1) == 8L)
    assert(f.getSeq[Long](2).size == 2)
    // bare extractAllGroups = the horizontal form
    val g = spark.sql(
      """SELECT extractAllGroups('k=v, k2=v2', '(\\w+)=(\\w+)') AS g""").head()
    assert(g.getSeq[Seq[String]](0) == Seq(Seq("k", "k2"), Seq("v", "v2")))
  }
}
