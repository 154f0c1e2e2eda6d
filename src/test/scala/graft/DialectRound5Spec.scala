package graft

import org.apache.spark.sql.functions._

/** Round-5 dialect surface: the vector-math kernel family, statistical
  * aggregates (entropy / rankCorr / t-tests / interval sweeps) and the
  * array membership helpers. The t-test p-values — which no SQL oracle
  * can replay — are pinned here against published t-table values. */
class DialectRound5Spec extends SparkSpec {
  import spark.implicits._

  test("vector kernels: distances, norms, normalize") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(0.0f, 0.0f))).toDF("a", "b")
    val r = df.selectExpr(
      "dotProduct(a, a) AS dot",
      "L2Norm(a) AS n2",
      "L1Norm(a) AS n1",
      "LinfNorm(a) AS ninf",
      "L2Distance(a, b) AS d2",
      "L2SquaredDistance(a, b) AS d2s",
      "L1Distance(a, b) AS d1",
      "LinfDistance(a, b) AS dinf").head()
    assert(r.getDouble(0) == 25.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 7.0)
    assert(r.getDouble(3) == 4.0 && r.getDouble(4) == 5.0 && r.getDouble(5) == 25.0)
    assert(r.getDouble(6) == 7.0 && r.getDouble(7) == 4.0)
    // cosine of identical vectors is 0; orthogonal is 1
    val c = Seq((Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b")
      .selectExpr("round(cosineDistance(a, a), 10) AS same", "cosineDistance(a, b) AS orth").head()
    assert(c.getDouble(0) == 0.0 && c.getDouble(1) == 1.0)
    val nz = Seq(Tuple1(Seq(3.0, 4.0))).toDF("a")
      .selectExpr("L2Normalize(a) AS u").head().getSeq[Double](0)
    assert(nz == Seq(0.6, 0.8))
  }

  test("array membership and folds: hasAll/hasAny/arrayMin/arrayMax/arrayProduct") {
    val r = Seq(Tuple1(Seq(3, 1, 2))).toDF("a").selectExpr(
      "hasAll(a, array(1, 2)) AS all_in",
      "hasAll(a, array(1, 9)) AS not_all",
      "hasAny(a, array(9, 2)) AS any_in",
      "hasAny(a, array(9, 8)) AS none_in",
      "arrayMin(a) AS mn",
      "arrayMax(a) AS mx",
      "arrayProduct(a) AS pr").head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
    assert(r.getInt(4) == 1 && r.getInt(5) == 3 && r.getDouble(6) == 6.0)
  }

  test("entropy: bits of the value distribution, merge-order independent") {
    val df = Seq("a", "a", "b", "b").toDF("v")
    for (parts <- Seq(1, 4)) {
      assert(df.repartition(parts).selectExpr("entropy(v)").head().getDouble(0) == 1.0)
    }
    // uniform over 4 values → 2 bits; single value → 0 (not −0)
    assert(Seq("a", "b", "c", "d").toDF("v").selectExpr("entropy(v)").head().getDouble(0) == 2.0)
    val single = Seq("a", "a").toDF("v").selectExpr("entropy(v)").head().getDouble(0)
    assert(single == 0.0 && (1.0 / single) > 0) // +0.0, not -0.0
  }

  test("rankCorr: Spearman with average-tie ranks") {
    // perfectly monotone (nonlinear) → 1; reversed → −1
    val mono = Seq.tabulate(10)(i => (i.toDouble, math.exp(i.toDouble))).toDF("x", "y")
    assert(mono.selectExpr("rankCorr(x, y)").head().getDouble(0) == 1.0)
    assert(mono.selectExpr("rankCorr(x, -y)").head().getDouble(0) == -1.0)
    // tie handling: known Spearman for x=(1,2,2,3), y=(1,3,2,4):
    // rx=(1,2.5,2.5,4), ry=(1,3,2,4) → ρ = 4.5/√22.5 = 0.9486832...
    val ties = Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    val rho = ties.selectExpr("rankCorr(x, y)").head().getDouble(0)
    assert(math.abs(rho - 0.9486832980505138) < 1e-12)
    // constant column → null; partition-count independent
    assert(Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
      .selectExpr("rankCorr(x, y)").head().isNullAt(0))
    val big = Seq.tabulate(100)(i => ((i * 7 % 100).toDouble, (i * 13 % 50).toDouble)).toDF("x", "y")
    val one = big.repartition(1).selectExpr("round(rankCorr(x, y), 12)").head().getDouble(0)
    val many = big.repartition(8).selectExpr("round(rankCorr(x, y), 12)").head().getDouble(0)
    assert(one == many)
  }

  test("t-tests: statistic formulas and p-values vs published tables") {
    // samples {1..5} (index 0) vs {2..6} (index 1): pooled s²=2.5,
    // t = −1, df = 8 → two-sided p = 0.34659... (standard t table)
    val df = (Seq(1, 2, 3, 4, 5).map((_, 0)) ++ Seq(2, 3, 4, 5, 6).map((_, 1))).toDF("v", "g")
    val s = df.selectExpr(
      "tupleElement(studentTTest(v, g), 't_stat') AS t",
      "tupleElement(studentTTest(v, g), 'p_value') AS p").head()
    assert(math.abs(s.getDouble(0) - (-1.0)) < 1e-12)
    assert(math.abs(s.getDouble(1) - 0.34659) < 2e-4)
    // equal variances → Welch t equals Student t; Welch df stays 8
    val w = df.selectExpr(
      "tupleElement(welchTTest(v, g), 't_stat') AS t",
      "tupleElement(welchTTest(v, g), 'p_value') AS p").head()
    assert(math.abs(w.getDouble(0) - (-1.0)) < 1e-12)
    assert(math.abs(w.getDouble(1) - 0.34659) < 2e-4)
    // identical samples → t = 0, p = 1
    val same = (Seq(1, 2, 3).map((_, 0)) ++ Seq(1, 2, 3).map((_, 1))).toDF("v", "g")
    val z = same.selectExpr("tupleElement(studentTTest(v, g), 'p_value')").head()
    assert(z.getDouble(0) == 1.0)
  }

  test("simpleLinearRegression / boundingRatio / sumCount") {
    // y = 2x + 1 exactly
    val lin = Seq.tabulate(5)(i => (i.toDouble, 2.0 * i + 1)).toDF("x", "y")
    val r = lin.selectExpr(
      "tupleElement(simpleLinearRegression(x, y), 'k') AS k",
      "tupleElement(simpleLinearRegression(x, y), 'b') AS b",
      "boundingRatio(x, y) AS br",
      "tupleElement(sumCount(y), 'sum') AS s",
      "tupleElement(sumCount(y), 'count') AS c").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == 25.0 && r.getLong(4) == 5L)
  }

  test("groupArrayMovingSum/Avg: windowed folds over the sorted group array") {
    val df = Seq(1, 3, 2, 5, 4).toDF("v") // sorted: 1 2 3 4 5
    val ms = df.selectExpr("groupArrayMovingSum(2)(v) AS s").head().getSeq[Double](0)
    assert(ms == Seq(1.0, 3.0, 5.0, 7.0, 9.0))
    val ma = df.selectExpr("groupArrayMovingAvg(2)(v) AS a").head().getSeq[Double](0)
    assert(ma == Seq(1.0, 1.5, 2.5, 3.5, 4.5))
    // parameterless form: whole-prefix sums (cumulative)
    val cum = df.selectExpr("groupArrayMovingSum(v) AS s").head().getSeq[Double](0)
    assert(cum == Seq(1.0, 3.0, 6.0, 10.0, 15.0))
  }

  test("ORDER BY WITH FILL fills grid gaps and keeps off-grid rows") {
    Seq((1, 10L), (3, 30L), (7, 70L)).toDF("d", "v").createOrReplaceTempView("wf_t")
    val out = spark.sql(
      """SELECT d, sum(v) AS s FROM wf_t GROUP BY d ORDER BY d WITH FILL FROM 0 TO 6 STEP 2""")
      .as[(Int, Long)].collect().toSeq
    // grid {0,2,4} zero-filled; source rows 1,3,7 (off-grid/outside) kept
    assert(out == Seq((0, 0L), (1, 10L), (2, 0L), (3, 30L), (4, 0L), (7, 70L)))
    // default step = 1
    val d1 = spark.sql(
      """SELECT d, sum(v) AS s FROM wf_t GROUP BY d ORDER BY d WITH FILL FROM 1 TO 4""")
      .as[(Int, Long)].collect().toSeq
    assert(d1 == Seq((1, 10L), (2, 0L), (3, 30L), (7, 70L)))
  }

  test("date long tail: quarter/minute buckets, last day, month name, subtract family") {
    val r = Seq(Tuple1("2026-08-12 13:47:31")).toDF("s")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts")
      .selectExpr(
        "CAST(toStartOfQuarter(ts) AS STRING) AS q",
        "CAST(toStartOfMinute(ts) AS STRING) AS mi",
        "CAST(toStartOfFiveMinutes(ts) AS STRING) AS m5",
        "CAST(toStartOfFifteenMinutes(ts) AS STRING) AS m15",
        "CAST(toLastDayOfMonth(ts) AS STRING) AS ld",
        "monthName(ts) AS mn",
        "CAST(subtractYears(ts, 1) AS STRING) AS sy",
        "CAST(addQuarters(ts, 2) AS STRING) AS aq").head()
    assert(r.getString(0) == "2026-07-01 00:00:00")
    assert(r.getString(1) == "2026-08-12 13:47:00")
    assert(r.getString(2) == "2026-08-12 13:45:00")
    assert(r.getString(3) == "2026-08-12 13:45:00")
    assert(r.getString(4) == "2026-08-31")
    assert(r.getString(5) == "August")
    assert(r.getString(6) == "2025-08-12 13:47:31")
    assert(r.getString(7) == "2027-02-12 13:47:31")
  }

  test("association coefficients: perfect, independent, and tie cases") {
    // x == y on two categories: perfect association
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")).toDF("x", "y")
    val p = perfect.selectExpr(
      "cramersV(x, y) AS v", "theilsU(x, y) AS u", "contingency(x, y) AS c").head()
    assert(p.getDouble(0) == 1.0 && p.getDouble(1) == 1.0)
    assert(math.abs(p.getDouble(2) - math.sqrt(0.5)) < 1e-12) // chi2 = n
    // independent uniform 2×2: association 0
    val indep = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")).toDF("x", "y")
    val i = indep.selectExpr(
      "cramersV(x, y) AS v", "theilsU(x, y) AS u", "contingency(x, y) AS c").head()
    assert(i.getDouble(0) == 0.0 && i.getDouble(1) == 0.0 && i.getDouble(2) == 0.0)
    // single category on one axis → degenerate → null V; merge-order independence
    assert(Seq(("a", "p"), ("a", "q")).toDF("x", "y")
      .selectExpr("cramersV(x, y)").head().isNullAt(0))
    val big = Seq.tabulate(100)(k => (s"x${k % 3}", s"y${k % 4}")).toDF("x", "y")
    val one  = big.repartition(1).selectExpr("round(cramersVBiasCorrected(x, y), 12)").head().getDouble(0)
    val many = big.repartition(8).selectExpr("round(cramersVBiasCorrected(x, y), 12)").head().getDouble(0)
    assert(one == many)
  }

  test("intervalLengthSum: union length, overlaps once, degenerates ignored") {
    val iv = Seq((1, 3), (2, 5), (7, 8), (4, 4)).toDF("s", "e")
    assert(iv.selectExpr("intervalLengthSum(s, e)").head().getDouble(0) == 5.0)
    // touching intervals merge with no double-count
    assert(Seq((1, 2), (2, 3)).toDF("s", "e")
      .selectExpr("intervalLengthSum(s, e)").head().getDouble(0) == 2.0)
  }

  test("string search: countSubstrings/multiSearch/countMatches/ngramDistance") {
    val df = Seq(Tuple1("the table and the stable table")).toDF("s")
    val r = df.selectExpr(
      "countSubstrings(s, 'table') AS c",
      "CAST(multiSearchAny(s, array('xx', 'stab')) AS INT) AS any1",
      "CAST(multiSearchAny(s, array('xx', 'yy')) AS INT) AS any0",
      "arrayStringConcat(arrayMap(x -> toString(x), multiSearchAllPositions(s, array('table', 'zz'))), ',') AS pos",
      "countMatches(s, 'ta[bg]le') AS cm",
      "CAST(match(s, '^the') AS INT) AS m").head()
    assert(r.getLong(0) == 3L && r.getInt(1) == 1 && r.getInt(2) == 0)
    assert(r.getString(3) == "5,0" && r.getLong(4) == 3L && r.getInt(5) == 1)
    // extractAll: whole match without a capture group, group 1 with one
    val e = Seq(Tuple1("a1 b22 c333")).toDF("s").selectExpr(
      "arrayStringConcat(extractAll(s, '[a-z][0-9]+'), ',') AS whole",
      "arrayStringConcat(extractAll(s, '[a-z]([0-9]+)'), ',') AS grp").head()
    assert(e.getString(0) == "a1,b22,c333" && e.getString(1) == "1,22,333")
    // ngramDistance: 0 identical, 1 disjoint, 0.5 half-shared grams
    val d = Seq(("abcde", "abcdf")).toDF("a", "b").selectExpr(
      "ngramDistance(a, a) AS same",
      "ngramDistance(a, 'zzzzz') AS far",
      "ngramDistance(a, b) AS half",
      "ngramDistance('ab', 'ab') AS short_same",
      "ngramDistance('', '') AS empty").head()
    assert(d.getDouble(0) == 0.0 && d.getDouble(1) == 1.0 && d.getDouble(2) == 0.5)
    assert(d.getDouble(3) == 0.0 && d.getDouble(4) == 0.0)
  }

  test("map family: access, containment, element-wise merges") {
    val r = spark.sql(
      """SELECT mapKeys(m) AS ks, mapValues(m) AS vs,
        |       mapContains(m, 'b') AS has_b, mapContains(m, 'z') AS has_z,
        |       mapContainsKeyLike(m, 'a%') AS like_a,
        |       element_at(mapAdd(m, map('a', 10.0, 'z', 1.0)), 'a') AS a_add,
        |       element_at(mapAdd(m, map('a', 10.0, 'z', 1.0)), 'z') AS z_add,
        |       element_at(mapSubtract(m, map('b', 0.5)), 'b') AS b_sub,
        |       element_at(mapUpdate(m, map('a', 99.0)), 'a') AS a_upd,
        |       element_at(mapUpdate(m, map('c', 7.0)), 'c') AS c_new,
        |       mapKeys(mapFilter((k, v) -> v > 1.5, m)) AS big,
        |       mapKeys(mapExtractKeyLike(m, 'b%')) AS bkeys,
        |       mapExists((k, v) -> v > 1.5, m) AS any_big,
        |       mapAll((k, v) -> v > 0.5, m) AS all_pos
        |FROM (SELECT map('a', CAST(1.0 AS DOUBLE), 'b', CAST(2.0 AS DOUBLE)) AS m)""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a", "b") && r.getSeq[Double](1) == Seq(1.0, 2.0))
    assert(r.getBoolean(2) && !r.getBoolean(3) && r.getBoolean(4))
    assert(r.getDouble(5) == 11.0 && r.getDouble(6) == 1.0 && r.getDouble(7) == 1.5)
    assert(r.getDouble(8) == 99.0 && r.getDouble(9) == 7.0)
    assert(r.getSeq[String](10) == Seq("b") && r.getSeq[String](11) == Seq("b"))
    assert(r.getBoolean(12) && r.getBoolean(13))
  }

  test("mapPopulateSeries: dense axis, zero fill, explicit max") {
    val r = spark.sql(
      """SELECT mapPopulateSeries(array(1L, 4L), array(10L, 40L)) AS d,
        |       mapPopulateSeries(array(2L, 3L), array(5L, 6L), 5) AS m""".stripMargin).head()
    val d = r.getStruct(0)
    assert(d.getSeq[Long](0) == Seq(1L, 2L, 3L, 4L))
    assert(d.getSeq[Long](1) == Seq(10L, 0L, 0L, 40L))
    val m = r.getStruct(1)
    assert(m.getSeq[Long](0) == Seq(2L, 3L, 4L, 5L))
    assert(m.getSeq[Long](1) == Seq(5L, 6L, 0L, 0L))
  }

  test("float guards: IEEE divide, isFinite family, arithmetic spellings") {
    val r = spark.sql(
      """SELECT divide(1.0, 0.0) AS pinf, divide(-2.0, 0.0) AS ninf,
        |       divide(0.0, 0.0) AS nan, divide(7.0, 2.0) AS q,
        |       isFinite(1.5) AS f1, isFinite(divide(1.0, 0.0)) AS f2,
        |       isInfinite(divide(-1.0, 0.0)) AS i1, isInfinite(3.0) AS i2,
        |       ifNotFinite(divide(1.0, 0.0), -1.0) AS g1, ifNotFinite(2.5, -1.0) AS g2,
        |       plus(2, 3) AS p, minus(2, 3) AS mn, multiply(4, 5) AS ml,
        |       negate(7) AS ng, exp2(10) AS e2, exp10(3) AS e10,
        |       toLowCardinality('x') AS lc, materialize(5) AS mat, ignore(99) AS ig""".stripMargin).head()
    assert(r.getDouble(0).isPosInfinity && r.getDouble(1).isNegInfinity && r.getDouble(2).isNaN)
    assert(r.getDouble(3) == 3.5)
    assert(r.getBoolean(4) && !r.getBoolean(5) && r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getDouble(8) == -1.0 && r.getDouble(9) == 2.5)
    assert(r.getInt(10) == 5 && r.getInt(11) == -1 && r.getInt(12) == 20 && r.getInt(13) == -7)
    assert(r.getDouble(14) == 1024.0 && r.getDouble(15) == 1000.0)
    assert(r.getString(16) == "x" && r.getInt(17) == 5 && r.getInt(18) == 0)
  }

  test("combinators: -Distinct, -OrNull on empty sets, -OrDefault") {
    val r = spark.sql(
      """SELECT sumDistinct(v) AS sd, avgDistinct(v) AS ad, countDistinct(v) AS cd,
        |       countOrNull(CASE WHEN v > 99 THEN 1 END) AS cn,
        |       sumOrNull(CASE WHEN v > 99 THEN v END) AS sn,
        |       sumOrDefault(CASE WHEN v > 99 THEN v END) AS sdef,
        |       maxOrDefault(CASE WHEN v > 99 THEN v END) AS mdef,
        |       any(k) AS a
        |FROM VALUES ('x', 1), ('x', 1), ('x', 2) AS t(k, v)""".stripMargin).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == 1.5 && r.getLong(2) == 2L)
    assert(r.isNullAt(3) && r.isNullAt(4))
    assert(r.getLong(5) == 0L && r.getInt(6) == 0)
    assert(r.getString(7) == "x")
  }

  test("forEach combinators: ragged arrays, null elements, NaN-free tails") {
    val r = spark.sql(
      """SELECT sumForEach(a) AS s, minForEach(a) AS mn, maxForEach(a) AS mx,
        |       countForEach(a) AS c, avgForEach(a) AS av
        |FROM VALUES (array(1L, 10L, 100L)), (array(3L, 30L)), (array(5L)) AS t(a)""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(9L, 40L, 100L))
    assert(r.getSeq[Long](1) == Seq(1L, 10L, 100L))
    assert(r.getSeq[Long](2) == Seq(5L, 30L, 100L))
    assert(r.getSeq[Long](3) == Seq(3L, 2L, 1L))
    assert(r.getSeq[Double](4) == Seq(3.0, 20.0, 100.0))
    // null elements: counted out, summed as absent
    val n = spark.sql(
      """SELECT sumForEach(a) AS s, countForEach(a) AS c
        |FROM VALUES (array(1L, NULL)), (array(2L, 5L)) AS t(a)""".stripMargin).head()
    assert(n.getSeq[Long](0) == Seq(3L, 5L) && n.getSeq[Long](1) == Seq(2L, 1L))
  }

  test("resample combinators: range filter, empty buckets, NaN avg") {
    val r = spark.sql(
      """SELECT countResample(0, 6, 2)(k) AS c,
        |       sumResample(0, 6, 2)(v, k) AS s,
        |       avgResample(0, 6, 2)(v, k) AS av
        |FROM VALUES (0, 10L), (1, 20L), (5, 50L), (9, 99L), (-1, 77L) AS t(k, v)""".stripMargin).head()
    // buckets [0,2) [2,4) [4,6): k=9 and k=-1 fall outside and vanish
    assert(r.getSeq[Long](0) == Seq(2L, 0L, 1L))
    assert(r.getSeq[Long](1) == Seq(30L, 0L, 50L))
    val av = r.getSeq[Double](2)
    assert(av(0) == 15.0 && av(1).isNaN && av(2) == 50.0)
  }

  test("JSON long tail: paths, typed extraction, length, type tags") {
    val j = """{"a": 5, "b": [10, 20, 30], "c": {"d": "deep"}, "e": -2.5, "f": false}"""
    val r = spark.sql(
      s"""SELECT JSONExtractInt('$j', 'a') AS a,
         |       JSONExtractInt('$j', 'b', 2) AS b2,
         |       JSONExtractString('$j', 'c', 'd') AS d,
         |       JSONExtractFloat('$j', 'e') AS e,
         |       JSONExtractBool('$j', 'f') AS f,
         |       JSONHas('$j', 'c') AS has_c, JSONHas('$j', 'x') AS has_x,
         |       JSONLength('$j') AS olen,
         |       JSONLength('$j', 'b') AS alen,
         |       JSONType('$j', 'b') AS tb, JSONType('$j', 'e') AS te,
         |       JSONType('$j', 'a') AS ta, JSONType('$j', 'c') AS tc,
         |       isValidJSON('$j') AS ok, isValidJSON('nope{') AS bad""".stripMargin).head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 20L && r.getString(2) == "deep")
    assert(r.getDouble(3) == -2.5 && !r.getBoolean(4))
    assert(r.getBoolean(5) && !r.getBoolean(6))
    assert(r.getInt(7) == 5 && r.getInt(8) == 3)
    assert(r.getString(9) == "Array" && r.getString(10) == "Double")
    assert(r.getString(11) == "Int64" && r.getString(12) == "Object")
    assert(r.getBoolean(13) && !r.getBoolean(14))
  }

  test("GLOBAL hint strips before IN/JOIN only, never inside names or strings") {
    import graft.plans.ChSqlParser.rewriteParametric
    assert(rewriteParametric("SELECT * FROM a GLOBAL JOIN b ON a.k = b.k")
      == "SELECT * FROM a JOIN b ON a.k = b.k")
    assert(rewriteParametric("WHERE x GLOBAL IN (SELECT k FROM t)")
      == "WHERE x IN (SELECT k FROM t)")
    assert(rewriteParametric("WHERE x GLOBAL NOT IN (SELECT k FROM t)")
      == "WHERE x NOT IN (SELECT k FROM t)")
    assert(rewriteParametric("SELECT global_rank FROM t")
      == "SELECT global_rank FROM t")
    assert(rewriteParametric("SELECT 'GLOBAL IN text' AS s FROM t")
      == "SELECT 'GLOBAL IN text' AS s FROM t")
  }

  test("lagInFrame/leadInFrame resolve as native offset window functions") {
    val r = spark.sql(
      """SELECT k, v,
        |       lagInFrame(v) OVER (ORDER BY k) AS l1,
        |       lagInFrame(v, 2, -1) OVER (ORDER BY k) AS l2,
        |       leadInFrame(v, 1, 0) OVER (ORDER BY k) AS ld
        |FROM VALUES (1, 10), (2, 20), (3, 30) AS t(k, v)
        |ORDER BY k""".stripMargin).collect()
    assert(r.map(x => if (x.isNullAt(2)) -99 else x.getInt(2)).toSeq == Seq(-99, 10, 20))
    assert(r.map(_.getInt(3)).toSeq == Seq(-1, -1, 10))
    assert(r.map(_.getInt(4)).toSeq == Seq(20, 30, 0))
  }

  test("collapseSumming: sums the named columns, min for the rest, keeps column order") {
    val df = Seq((1L, 5.0, "b"), (1L, 7.0, "a"), (2L, 1.0, "z")).toDF("k", "v", "tag")
    val out = graft.operators.Replicate.collapseSumming(df, Seq("k"), Seq("v"))
    assert(out.columns.toSeq == Seq("k", "v", "tag"))
    val rows = out.orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      == Seq((1L, 12.0, "a"), (2L, 1.0, "z")))
  }

  test("array long tail: reduce, compact, enumerate-uniq, surgery, range") {
    val r = spark.sql(
      """SELECT arrayReduce('sum', array(1L, 2L, 3L)) AS s,
        |       arrayReduce('avg', array(2L, 4L)) AS av,
        |       arrayReduce('count', array(1L, NULL, 3L)) AS c,
        |       arrayReduce('uniqExact', array(1L, 1L, NULL, 2L)) AS u,
        |       arrayReduce('median', array(5L, 1L, 3L)) AS med,
        |       arrayReduce('median', array(4L, 1L, 3L, 2L)) AS med_even,
        |       arrayReduce('any', array(7L, 8L)) AS a1,
        |       arrayReduce('anyLast', array(7L, 8L)) AS a2,
        |       arrayReduce('argMax', array('a', 'b', 'c'), array(1, 9, 2)) AS am,
        |       arrayCompact(array(1, 1, 2, 2, 1)) AS cp,
        |       arrayEnumerateUniq(array(10, 20, 10, 10)) AS eu,
        |       arrayResize(array(1, 2, 3), 2) AS shrink,
        |       arrayResize(array(1, 2), 4, 9) AS grow,
        |       arrayResize(array(1, 2), 3) AS grow_null,
        |       arraySlice(array(1, 2, 3, 4), 2) AS open_slice,
        |       arrayPushFront(arrayPopBack(array(1, 2, 3)), 0) AS surgery,
        |       arrayWithConstant(3, 'z') AS wc,
        |       arrayReverseSort(array(2, 9, 5)) AS rs,
        |       range(4) AS r1, range(2, 2) AS r_empty, range(10, 2) AS r_neg""".stripMargin).head()
    assert(r.getDouble(0) == 6.0 && r.getDouble(1) == 3.0)
    assert(r.getLong(2) == 2L && r.getInt(3) == 2)
    assert(r.getLong(4) == 3L && r.getLong(5) == 2L) // nearest-rank lower median
    assert(r.getLong(6) == 7L && r.getLong(7) == 8L && r.getString(8) == "b")
    assert(r.getSeq[Int](9) == Seq(1, 2, 1))
    assert(r.getSeq[Int](10) == Seq(1, 1, 2, 3))
    assert(r.getSeq[Int](11) == Seq(1, 2))
    assert(r.getSeq[Int](12) == Seq(1, 2, 9, 9))
    assert(r.getSeq[Any](13) == Seq(1, 2, null))
    assert(r.getSeq[Int](14) == Seq(2, 3, 4)) // Int.MaxValue length would overflow to []
    assert(r.getSeq[Int](15) == Seq(0, 1, 2))
    assert(r.getSeq[String](16) == Seq("z", "z", "z"))
    assert(r.getSeq[Int](17) == Seq(9, 5, 2))
    assert(r.getSeq[Long](18) == Seq(0L, 1L, 2L, 3L))
    assert(r.getSeq[Long](19) == Seq() && r.getSeq[Long](20) == Seq())
  }

  test("tokens/ngrams/Lp kernels/sketch aliases") {
    val r = spark.sql(
      """SELECT tokens('Hello, wonderful world! 42') AS t,
        |       ngrams('spark', 3) AS g,
        |       ngrams('ab', 3) AS g_short,
        |       round(LpNorm(array(3.0, 4.0), 2.0), 6) AS lp2,
        |       round(LpNorm(array(3.0, -4.0), 1.0), 6) AS lp1,
        |       round(LpDistance(array(0.0, 0.0), array(3.0, 4.0), 2.0), 6) AS lpd,
        |       quantileTiming(0.5)(v) AS qt,
        |       quantileDeterministic(0.5)(v, v) AS qd,
        |       uniqTheta(v) AS ut
        |FROM VALUES (1.0), (2.0), (3.0) AS t(v)""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("Hello", "wonderful", "world", "42"))
    assert(r.getSeq[String](1) == Seq("spa", "par", "ark"))
    assert(r.getSeq[String](2) == Seq())
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 7.0 && r.getDouble(5) == 5.0)
    assert(r.getDouble(6) == 2.0 && r.getDouble(7) == 2.0 && r.getLong(8) == 3L)
  }

  test("arrayFold, countEqual, arrayAUC") {
    val r = spark.sql(
      """SELECT arrayFold((acc, x) -> acc * 10 + x, array(1L, 2L, 3L), 0L) AS f,
        |       countEqual(array(1, 2, 1, NULL, 1), 1) AS ce,
        |       countEqual(array(1, NULL, 2), NULL) AS cn,
        |       round(arrayAUC(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1)), 6) AS auc,
        |       round(arrayAUC(array(0.5, 0.5), array(0, 1)), 6) AS auc_tie,
        |       arrayAUC(array(0.3, 0.7), array(1, 1)) AS auc_one_class""".stripMargin).head()
    assert(r.getLong(0) == 123L)
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.75) // the classic sklearn roc_auc_score example
    assert(r.getDouble(4) == 0.5)  // tied scores -> chance
    assert(r.getDouble(5).isNaN)   // one class absent
  }

  test("rank tests, deltaSumTimestamp, bounded groupArray, singleValueOrNull") {
    // U of {1,2,3} vs {2,3,4}: pooled avg ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    // → R0 = 8, U0 = 8 − 3·4/2 = 2 (scipy mannwhitneyu agrees)
    val r = spark.sql(
      """SELECT mannWhitneyUTest(v, g) AS u,
               kolmogorovSmirnovTest(v, g) AS d
         FROM VALUES (1.0, 0), (2.0, 0), (3.0, 0), (2.0, 1), (3.0, 1), (4.0, 1) t(v, g)""").head()
    assert(r.getDouble(0) == 2.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12) // max ECDF gap
    // the CH parametric spelling with an alternative literal parses too
    val rp = spark.sql(
      """SELECT mannWhitneyUTest('two-sided')(v, g) AS u
         FROM VALUES (1.0, 0), (2.0, 1) t(v, g)""").head()
    assert(rp.getDouble(0) == 0.0)
    val d = spark.sql(
      """SELECT deltaSumTimestamp(v, ts) AS s
         FROM VALUES (1.0, 1), (5.0, 2), (3.0, 3), (7.0, 4) t(v, ts)""").head()
    assert(d.getDouble(0) == 8.0) // +4, −2, +4 → 8
    val misc = spark.sql(
      """SELECT groupArray(2)(v) AS g2,
               singleValueOrNull(k) AS sv1,
               singleValueOrNull(v) AS svn
         FROM VALUES (5L, 'x'), (3L, 'x'), (9L, 'x') t(v, k)""").head()
    assert(misc.getSeq[Long](0) == Seq(3L, 5L)) // smallest 2, sorted
    assert(misc.getString(1) == "x")
    assert(misc.isNullAt(2)) // three distinct values → NULL
    // meanZTest: means 2 vs 4, σ² = 1 both, n = 3 each →
    // z = −2/√(2/3) = −√6 ≈ −2.449489…
    val z = spark.sql(
      """SELECT meanZTest(1.0, 1.0, 0.95)(v, g) AS z
         FROM VALUES (1.0, 0), (2.0, 0), (3.0, 0), (3.0, 1), (4.0, 1), (5.0, 1) t(v, g)""").head()
    assert(math.abs(z.getDouble(0) + math.sqrt(6.0)) < 1e-12)
  }

  test("trailing SETTINGS / FORMAT clauses strip end-anchored") {
    import graft.plans.ChSqlParser.rewriteParametric
    assert(rewriteParametric("SELECT 1 FORMAT JSON") == "SELECT 1")
    assert(rewriteParametric("SELECT 1 SETTINGS max_threads = 8") == "SELECT 1")
    assert(rewriteParametric(
      "SELECT a FROM t ORDER BY a SETTINGS max_threads = 8, join_algorithm = 'hash' FORMAT Pretty")
      == "SELECT a FROM t ORDER BY a")
    // mid-query occurrences (subquery text, identifiers) are untouched
    val mid = "SELECT format FROM t WHERE settings = 1"
    assert(rewriteParametric(mid) == mid)
    // a string literal ending in a SETTINGS-shaped tail is NOT a
    // clause — quote parity protects it
    val lit = "SELECT 'x SETTINGS a = 1'"
    assert(rewriteParametric(lit) == lit)
    assert(rewriteParametric(
      "SELECT 'keep SETTINGS a = 1' AS s FROM t SETTINGS real_knob = 2")
      == "SELECT 'keep SETTINGS a = 1' AS s FROM t")
    val fmtLit = "SELECT 'x FORMAT JSON'"
    assert(rewriteParametric(fmtLit) == fmtLit)
  }

  test("scalar WITH substitutes constants; CTEs pass through untouched") {
    import graft.plans.ChSqlParser.rewriteParametric
    assert(rewriteParametric("WITH 5 AS n SELECT n * 2 AS x FROM t")
      == "SELECT (5) * 2 AS x FROM t")
    assert(rewriteParametric("WITH toYear(d) AS yr, 2 AS k SELECT yr, k FROM t WHERE yr > k")
      == "SELECT (toYear(d)), (2) FROM t WHERE (toYear(d)) > (2)")
    // word boundary: ident `n` must not rewrite inside `name`
    assert(rewriteParametric("WITH 5 AS n SELECT name, n FROM t")
      == "SELECT name, (5) FROM t")
    // string literals survive
    assert(rewriteParametric("WITH 5 AS n SELECT 'n is n', n FROM t")
      == "SELECT 'n is n', (5) FROM t")
    // a real CTE is untouched
    val cte = "WITH big AS (SELECT k FROM t) SELECT * FROM big"
    assert(rewriteParametric(cte) == cte)
    // exact-quantile variants resolve end to end
    val r = spark.sql(
      """SELECT quantileExactLow(0.5)(v) AS lo, quantileExactHigh(0.5)(v) AS hi,
        |       quantileExactLow(0.0)(v) AS mn, quantileExactHigh(1.0)(v) AS mx
        |FROM VALUES (1), (2), (3), (4) AS t(v)""".stripMargin).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 3 && r.getInt(2) == 1 && r.getInt(3) == 4)
    // median* aliases = the quantile* counterpart pinned at 0.5;
    // medianTDigest is Float64 whatever the input (CH contract)
    val m = spark.sql(
      """SELECT medianExact(v) AS me, medianExactLow(v) AS ml, medianExactHigh(v) AS mh,
        |       medianDeterministic(v) AS md, round(medianTDigest(v), 1) AS mt,
        |       medianExactWeighted(v, 1) AS mw
        |FROM VALUES (1), (2), (3), (4) AS t(v)""".stripMargin).head()
    assert(m.getDouble(0) == 2.5 && m.getInt(1) == 2 && m.getInt(2) == 3)
    assert(m.getDouble(3) == 2.5 && m.getDouble(4) == 2.0)
    assert(m.get(5) match { case i: Int => i == 2; case d: Double => d == 2.0; case _ => false })
    // a mistyped weight arg errors instead of silently dropping it
    val arity = intercept[Exception](
      spark.sql("SELECT medianExact(v, 1) FROM VALUES (1) AS t(v)").head())
    assert(arity.getMessage.contains("medianExact takes"))
  }

  test("OrNull conversions, ISO calendar, relative nums, -If distincts") {
    val r = spark.sql(
      """SELECT toInt64OrNull('42') AS a, toInt64OrNull('nope') AS b,
        |       toInt64OrZero('nope') AS c, toFloat64OrNull('1.5') AS d,
        |       toDateOrNull('2024-02-29') AS e, toDateOrNull('2024-02-30') AS f,
        |       parseDateTimeBestEffortOrNull('2024-01-02 03:04:05') AS g,
        |       toISOWeek(DATE '2021-01-01') AS w,  -- ISO week 53 of 2020
        |       toISOYear(DATE '2021-01-01') AS y,
        |       toRelativeDayNum(DATE '1970-01-11') AS dn,
        |       toRelativeHourNum(TIMESTAMP '1970-01-02 01:00:00') AS hn""".stripMargin).head()
    assert(r.getLong(0) == 42L && r.isNullAt(1) && r.getLong(2) == 0L && r.getDouble(3) == 1.5)
    assert(r.getDate(4).toString == "2024-02-29" && r.isNullAt(5))
    assert(r.getTimestamp(6).toString.startsWith("2024-01-02 03:04:05"))
    assert(r.getInt(7) == 53 && r.getInt(8) == 2020)
    assert(r.getInt(9) == 10 && r.getLong(10) == 25L)
    val agg = spark.sql(
      """SELECT uniqExactIf(v, k = 'a') AS ua, countDistinctIf(v, k = 'z') AS uz
        |FROM VALUES ('a', 1), ('a', 1), ('a', 2), ('b', 9) AS t(k, v)""".stripMargin).head()
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 0L)
  }

  test("age counts complete units where dateDiff counts boundaries") {
    val r = spark.sql(
      """SELECT age('day', TIMESTAMP '2024-01-01 23:59:00', TIMESTAMP '2024-01-02 00:01:00') AS a_d,
        |       dateDiff('day', TIMESTAMP '2024-01-01 23:59:00', TIMESTAMP '2024-01-02 00:01:00') AS dd_d,
        |       age('month', TIMESTAMP '2024-01-31 00:00:00', TIMESTAMP '2024-02-01 00:00:00') AS a_m,
        |       age('month', TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-03-15 00:00:00') AS a_m2,
        |       age('year', TIMESTAMP '2020-06-01 00:00:00', TIMESTAMP '2024-05-30 00:00:00') AS a_y,
        |       age('hour', TIMESTAMP '2024-01-01 10:30:00', TIMESTAMP '2024-01-01 13:00:00') AS a_h,
        |       date_diff('week', TIMESTAMP '2024-01-07 00:00:00', TIMESTAMP '2024-01-08 00:00:00') AS dd_w""".stripMargin).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L) // complete days vs day boundary
    assert(r.getLong(2) == 0L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 3L && r.getLong(5) == 2L)
    assert(r.getLong(6) == 1L) // quoted-unit date_diff routes to boundary semantics (Mon starts new ISO week)
  }

  test("uniq over tuples; uniqCombined precision knob") {
    val r = spark.sql(
      """SELECT uniq(a, b) AS tuples, uniq(a) AS singles,
        |       uniqCombined(v) AS plain, uniqCombined(16)(v) AS precise
        |FROM (SELECT id % 4 AS a, id % 2 AS b, id AS v FROM range(1000))""".stripMargin).head()
    assert(r.getLong(0) == 4L)  // (a, b) pairs: (0,0) (1,1) (2,0) (3,1)
    assert(r.getLong(1) == 4L)
    // 1000 distinct values; the K=16 sketch is tighter than default
    assert(math.abs(r.getLong(3) - 1000L) <= math.abs(r.getLong(2) - 1000L) + 5)
  }

  test("adaptive histogram: deterministic single-partition bins + invariants") {
    // 1,2 merge first (closest pair after the cap sweep): two clean bins
    val one = Seq(1.0, 2.0, 3.0, 4.0).toDF("v").repartition(1)
      .selectExpr("inline(histogram(2)(v))")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(one.length == 2)
    assert(one.map(_._3).sum == 4.0)
    assert(one.forall { case (lo, hi, _) => lo <= hi })
    // invariants survive multi-partition merges: bin cap, conserved
    // mass, ordered non-overlapping-center bins
    val rows = spark.range(5000).selectExpr("CAST(id % 997 AS DOUBLE) AS v")
      .repartition(11)
      .selectExpr("inline(histogram(10)(v))")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 10)
    assert(rows.map(_._3).sum == 5000.0)
    assert(rows.forall { case (lo, hi, h) => lo <= hi && h > 0 })
    val centers = rows.map { case (lo, hi, _) => (lo + hi) / 2 }
    assert(centers.sameElements(centers.sorted))
  }

  test("UTF8 normalization, whitespace/regexp splits, empty arrays, groupBitmap") {
    val r = spark.sql(
      """SELECT length(normalizeUTF8NFC('é')) AS nfc_len,
        |       length(normalizeUTF8NFD('é')) AS nfd_len,
        |       normalizeUTF8NFKC('①') AS circled_one,
        |       splitByWhitespace('  a  b\tc ') AS sw,
        |       splitByRegexp('[,;]', 'a,b;c') AS sr,
        |       emptyArrayInt64() AS ei, emptyArrayString() AS es_arr,
        |       size(emptyArrayFloat64()) AS ef_size""".stripMargin).head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 2) // é composes to 1 cp, decomposes to 2
    assert(r.getString(2) == "1")                // ① NFKC-folds to the digit
    assert(r.getSeq[String](3) == Seq("a", "b", "c"))
    assert(r.getSeq[String](4) == Seq("a", "b", "c"))
    assert(r.getSeq[Long](5) == Seq() && r.getSeq[String](6) == Seq() && r.getInt(7) == 0)
    val g = spark.sql(
      "SELECT groupBitmap(v) AS card FROM VALUES (1), (1), (2), (9) AS t(v)").head()
    assert(g.getLong(0) == 3L)
  }

  test("CH type casts, numbers(start, count), LIMIT WITH TIES, INTO OUTFILE") {
    import graft.plans.ChSqlParser.rewriteParametric
    assert(rewriteParametric("SELECT CAST(x AS UInt32), CAST(y AS Nullable(Int64)) FROM t")
      == "SELECT CAST(x AS BIGINT), CAST(y AS BIGINT) FROM t")
    assert(rewriteParametric("CAST(s AS LowCardinality(String)), CAST(f AS FixedString(8))")
      == "CAST(s AS STRING), CAST(f AS STRING)")
    // String/Date are valid Spark spellings already: untouched
    assert(rewriteParametric("SELECT CAST(x AS String), CAST(d AS Date) FROM t")
      == "SELECT CAST(x AS String), CAST(d AS Date) FROM t")
    val nums = spark.sql("SELECT max(number) AS m, count(*) AS c FROM numbers(5, 10)").head()
    assert(nums.getLong(0) == 14L && nums.getLong(1) == 10L)
    val ties = spark.sql(
      """SELECT v FROM (SELECT CAST(id / 3 AS INT) AS v FROM range(12)) t
        |ORDER BY v LIMIT 4 WITH TIES""".stripMargin).collect().map(_.getInt(0))
    assert(ties.toSeq == Seq(0, 0, 0, 1, 1, 1)) // the 4th row's key (1) keeps its ties
    // an OUTFILE tail that escapes the executable intercept (here: fed
    // straight to the rewriter, as a CTAS prefix would be) refuses
    // loudly instead of silently stripping
    val of = intercept[UnsupportedOperationException](
      rewriteParametric("SELECT 1 INTO OUTFILE '/tmp/x.csv' FORMAT CSV"))
    assert(of.getMessage.contains("top-level SELECT/WITH"))
  }

  test("transform dispatch, edit distance, string Jaccard, key-value parse") {
    val r = spark.sql(
      """SELECT transform(array(1, 2, 3), x -> x * 10) AS hof,
        |       transform(2, array(1, 2), array('a', 'b'), 'z') AS hit,
        |       transform(9, array(1, 2), array('a', 'b'), 'z') AS miss,
        |       transform(9, array(1, 2), array(10, 20)) AS keep_self,
        |       caseWithExpression(1, array(1), array('one'), '?') AS cwe,
        |       editDistance('kitten', 'sitting') AS ed,
        |       round(stringJaccardIndex('abc', 'bcd'), 4) AS sj,
        |       round(stringJaccardIndex('', ''), 4) AS sj_empty,
        |       element_at(extractKeyValuePairs('a:1,b:2'), 'b') AS kv,
        |       arrayElement(array(5, 6, 7), -1) AS last_el,
        |       concatAssumeInjective('x', 'y') AS cai""".stripMargin).head()
    assert(r.getSeq[Int](0) == Seq(10, 20, 30))
    assert(r.getString(1) == "b" && r.getString(2) == "z")
    assert(r.getInt(3) == 9 && r.getString(4) == "one")
    assert(r.getInt(5) == 3)
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 1.0)
    assert(r.getString(8) == "2" && r.getInt(9) == 7 && r.getString(10) == "xy")
  }

  test("DateTime64 conversions, array rotate/shift, indexHint, byteSize") {
    val r = spark.sql(
      """SELECT toUnixTimestamp64Milli(TIMESTAMP '1970-01-01 00:00:01.5') AS ms,
        |       toUnixTimestamp64Micro(TIMESTAMP '1970-01-01 00:00:01.5') AS us,
        |       toUnixTimestamp64Nano(TIMESTAMP '1970-01-01 00:00:01.5') AS ns,
        |       fromUnixTimestamp64Milli(1500) AS t_ms,
        |       fromUnixTimestamp64Nano(1500000000) AS t_ns,
        |       arrayRotateLeft(array(1, 2, 3, 4), 1) AS rl,
        |       arrayRotateLeft(array(1, 2, 3, 4), 6) AS rl_mod,
        |       arrayRotateRight(array(1, 2, 3, 4), 1) AS rr,
        |       arrayShiftLeft(array(1, 2, 3), 1, 0) AS sl,
        |       arrayShiftRight(array(1, 2, 3), 2, 9) AS sr,
        |       arrayShiftLeft(array(1, 2), 1) AS sl_null,
        |       indexHint(42) AS ih,
        |       byteSize('abc') AS bs""".stripMargin).head()
    assert(r.getLong(0) == 1500L && r.getLong(1) == 1500000L && r.getLong(2) == 1500000000L)
    assert(r.getTimestamp(3).getTime == 1500L && r.getTimestamp(4).getTime == 1500L)
    assert(r.getSeq[Int](5) == Seq(2, 3, 4, 1))
    assert(r.getSeq[Int](6) == Seq(3, 4, 1, 2))
    assert(r.getSeq[Int](7) == Seq(4, 1, 2, 3))
    assert(r.getSeq[Int](8) == Seq(2, 3, 0))
    assert(r.getSeq[Int](9) == Seq(9, 9, 1))
    assert(r.getSeq[Any](10) == Seq(2, null))
    assert(r.getInt(11) == 1 && r.getInt(12) == 3)
    // negative offsets dispatch to the opposite direction (CH semantics)
    val neg = spark.sql(
      """SELECT arrayShiftLeft(array(1, 2, 3), -1, 0) AS nl,
        |       arrayShiftRight(array(1, 2, 3), -2, 9) AS nr,
        |       arrayShiftLeft(array(1, 2), -5, 7) AS nl_over""".stripMargin).head()
    assert(neg.getSeq[Int](0) == Seq(0, 1, 2))
    assert(neg.getSeq[Int](1) == Seq(3, 9, 9))
    assert(neg.getSeq[Int](2) == Seq(7, 7))
  }

  test("replaceOne, extractGroups, case-insensitive counts, throwIf, dateName") {
    val r = spark.sql(
      """SELECT replaceOne('a-b-c', '-', '+') AS r1,
        |       replaceOne('abc', 'z', '+') AS r_miss,
        |       extractGroups('k=7;v=hi', 'k=(\\d+);v=(\\w+)') AS grp,
        |       countSubstringsCaseInsensitive('AbaBA', 'ab') AS ci,
        |       positionCaseInsensitiveUTF8('Hello', 'LLO') AS pci,
        |       throwIf(1 > 2, 'nope') AS ok,
        |       positiveModulo(-7, 3) AS pm,
        |       dateName('month', DATE '2024-03-05') AS mn,
        |       dateName('weekday', DATE '2024-03-05') AS wd""".stripMargin).head()
    assert(r.getString(0) == "a+b-c" && r.getString(1) == "abc")
    assert(r.getSeq[String](2) == Seq("7", "hi"))
    assert(r.getLong(3) == 2L && r.getInt(4) == 3)
    // empty needle: defined 0, never a division by zero
    val empt = spark.sql(
      """SELECT countSubstrings('abc', '') AS c0,
        |       countSubstringsCaseInsensitive('abc', '') AS ci0,
        |       countSubstringsCaseInsensitive('İstanbul İzmir', 'i̇') AS utf8""".stripMargin).head()
    assert(empt.getLong(0) == 0L && empt.getLong(1) == 0L)
    // 'İ' lowercases to a two-codepoint sequence; counting on the
    // lowered text keeps the delta and divisor consistent
    assert(empt.getLong(2) == 2L)
    assert(r.getInt(5) == 0 && r.getInt(6) == 2)
    assert(r.getString(7) == "March" && r.getString(8) == "Tuesday")
    val thrown = intercept[Exception] {
      spark.sql("SELECT throwIf(true, 'data quality gate') AS x").collect()
    }
    assert(thrown.getMessage.contains("data quality gate"))
  }

  test("ASOF JOIN rewrites to the union+window shape; unsupported shapes untouched") {
    import graft.plans.ChSqlParser.rewriteParametric
    val out = rewriteParametric(
      "SELECT p.x FROM probes p ASOF LEFT JOIN clicks c ON p.k = c.k AND p.ts >= c.ts ORDER BY p.x")
    // the scale-safe shape: right rows + probe markers through one
    // key-partitioned window, re-joined on equality — no LATERAL
    assert(out.contains("UNION ALL") && out.contains("last(__asof_r, true) OVER"))
    assert(!out.toUpperCase.contains("LATERAL"))
    assert(out.contains("ORDER BY __asof_t, __asof_side\n")) // inclusive latest-before
    // inner form, flipped operand order: still resolves direction
    val inner = rewriteParametric(
      "SELECT 1 FROM a x ASOF JOIN b y ON c.ts <= x.ts AND x.k = y.k WHERE x.k > 0")
    // y never referenced in the inequality → ambiguous → untouched (fails loudly later)
    assert(inner.contains("ASOF"))
    val flipped = rewriteParametric(
      "SELECT 1 FROM a x ASOF JOIN b y ON y.ts <= x.ts AND x.k = y.k")
    assert(flipped.contains("UNION ALL") && flipped.contains("ORDER BY __asof_t, __asof_side\n"))
    // strict inequality excludes equal-time right rows: probe marker
    // sorts FIRST at equal times
    val strict = rewriteParametric(
      "SELECT 1 FROM a x ASOF JOIN b y ON x.ts > y.ts AND x.k = y.k")
    assert(strict.contains("ORDER BY __asof_t, __asof_side DESC"))
    // earliest-after direction flips the time sort
    val fwd = rewriteParametric(
      "SELECT 1 FROM a x ASOF JOIN b y ON x.ts <= y.ts AND x.k = y.k")
    assert(fwd.contains("ORDER BY __asof_t DESC, __asof_side\n"))
    // end-to-end semantics (nearest preceding per key)
    Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "p").createOrReplaceTempView("asof_p")
    Seq((1L, 8L, "c1"), (1L, 15L, "c2"), (2L, 9L, "c3"))
      .toDF("k", "ts", "c").createOrReplaceTempView("asof_c")
    val q = """SELECT p.p, c.c FROM asof_p p ASOF LEFT JOIN asof_c c
              |ON p.k = c.k AND p.ts >= c.ts ORDER BY p.p""".stripMargin
    val df = spark.sql(q)
    val got = df.collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(got == Seq(("p1", "c1"), ("p2", "c2"), ("p3", null)))
    // the plan is nested-loop free — the inequality never reaches a
    // join condition (the round-5 LATERAL form planned a BNLJ domain join)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    // inclusive boundary: a click AT the purchase time matches; strict
    // (>) must skip it and take the earlier click
    Seq((1L, 15L, "pX")).toDF("k", "ts", "p").createOrReplaceTempView("asof_p2")
    val incl = spark.sql(
      """SELECT c.c FROM asof_p2 p ASOF LEFT JOIN asof_c c
        |ON p.k = c.k AND p.ts >= c.ts""".stripMargin).head()
    assert(incl.getString(0) == "c2")
    val strictGot = spark.sql(
      """SELECT c.c FROM asof_p2 p ASOF LEFT JOIN asof_c c
        |ON p.k = c.k AND p.ts > c.ts""".stripMargin).head()
    assert(strictGot.getString(0) == "c1")
    // inner ASOF drops unmatched probes
    val innerGot = spark.sql(
      """SELECT p.p, c.c FROM asof_p p ASOF JOIN asof_c c
        |ON p.k = c.k AND p.ts >= c.ts ORDER BY p.p""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(innerGot == Seq("p1", "p2"))
    // earliest-after: nearest FOLLOWING click
    val after = spark.sql(
      """SELECT p.p, c.c FROM asof_p p ASOF LEFT JOIN asof_c c
        |ON p.k = c.k AND p.ts <= c.ts ORDER BY p.p""".stripMargin)
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(after == Seq(("p1", "c2"), ("p2", null), ("p3", "c3")))
  }

  test("plural exact quantiles, groupArrayInsertAt") {
    val r = spark.sql(
      """SELECT quantilesExact(0.25, 0.75)(v) AS qs,
        |       size(quantilesTDigest(0.1, 0.5, 0.9)(v)) AS n_td,
        |       groupArrayInsertAt(-1, 6)(v, p) AS ins
        |FROM VALUES (10, 1), (20, 4), (30, 2) AS t(v, p)""".stripMargin).head()
    assert(r.getSeq[Double](0) == Seq(15.0, 25.0))
    assert(r.getInt(1) == 3)
    assert(r.getSeq[Int](2) == Seq(-1, 10, 30, -1, 20, -1))
  }

  test("readable time deltas, server constants, JSON string, UUID") {
    val r = spark.sql(
      """SELECT formatReadableTimeDelta(93784) AS big,
        |       formatReadableTimeDelta(61) AS small,
        |       formatReadableTimeDelta(0) AS zero,
        |       formatReadableTimeDelta(7200) AS exact_h,
        |       hostName() AS hn, version() AS v,
        |       toJSONString(named_struct('a', 1, 'b', 'x')) AS js,
        |       length(generateUUIDv4()) AS ulen""".stripMargin).head()
    assert(r.getString(0) == "1 day, 2 hours, 3 minutes, 4 seconds")
    assert(r.getString(1) == "1 minute, 1 second")
    assert(r.getString(2) == "0 seconds")
    assert(r.getString(3) == "2 hours")
    assert(r.getString(4) == "localhost" && r.getString(5).startsWith("graft"))
    assert(r.getString(6) == """{"a":1,"b":"x"}""")
    assert(r.getInt(7) == 36)
  }

  test("groupConcat sorts then joins") {
    val r = spark.sql(
      """SELECT groupConcat(', ')(v) AS with_sep, groupConcat(v) AS bare
        |FROM VALUES ('b'), ('a'), ('c') AS t(v)""".stripMargin).head()
    assert(r.getString(0) == "a, b, c" && r.getString(1) == "abc")
  }

  test("sumMap over a Map column; combined PREWHERE/WHERE") {
    val r = spark.sql(
      """SELECT sumMap(m) AS s
        |FROM VALUES (map('a', 1L, 'b', 2L)), (map('b', 10L, 'c', 5L)) AS t(m)""".stripMargin).head()
    val s = r.getStruct(0)
    assert(s.getSeq[String](0) == Seq("a", "b", "c"))
    assert(s.getSeq[Long](1) == Seq(1L, 12L, 5L))
    import graft.plans.ChSqlParser.rewriteParametric
    assert(rewriteParametric("SELECT x FROM t PREWHERE a > 1 WHERE b < 2")
      == "SELECT x FROM t WHERE (a > 1) AND b < 2")
    assert(rewriteParametric("SELECT x FROM t PREWHERE f(a) = 1 WHERE b < 2")
      == "SELECT x FROM t WHERE (f(a) = 1) AND b < 2")
    assert(rewriteParametric("SELECT x FROM t PREWHERE a > 1 ORDER BY x")
      == "SELECT x FROM t WHERE a > 1 ORDER BY x")
  }

  test("ClickHouse format names round-trip through files") {
    import graft.sources.Formats
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "k", "v")
    val root = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    for (fmt <- Seq("CSVWithNames", "TSVWithNames", "JSONEachRow", "Parquet", "ORC")) {
      val p = s"$root/$fmt"
      Formats.write(df, p, fmt)
      val back = Formats.read(spark, p, fmt,
        schemaDdl = if (fmt == "CSVWithNames" || fmt == "TSVWithNames")
          Some("id BIGINT, k STRING, v DOUBLE") else None)
      val rows = back.orderBy("id").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("k"), r.getAs[Double]("v"))).toSeq
      assert(rows == Seq((1L, "a", 1.5), (2L, "b", 2.5)), s"format $fmt")
    }
    // header-less CSV with an explicit schema
    Formats.write(df, s"$root/CSV", "CSV")
    val bare = Formats.read(spark, s"$root/CSV", "CSV", Some("id BIGINT, k STRING, v DOUBLE"))
    assert(bare.count() == 2 && bare.columns.toSeq == Seq("id", "k", "v"))
    intercept[IllegalArgumentException] { Formats.read(spark, root, "Pretty") }
  }

  test("bpeTrain learns the classic merge sequence deterministically") {
    import graft.operators.TextAnalysis
    // Sennrich et al.'s canonical corpus: low x5, lower x2, newest x6,
    // widest x3 — the first merges are (e,s), (es,t), (l,o), (lo,w)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
                Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeTrain(docs, "text", numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("low") == 7L)  // low + lower share the learned 'low' symbol
    assert(v("est") == 9L)  // newest + widest share 'est'
    assert(v.keySet.contains("n") && v.keySet.contains("w"))
  }

  test("bpeEncode applies trained merges greedily by rank (and memoizes per word)") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
                Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (merges, _) = TextAnalysis.bpeTrain(docs, "text", numMerges = 4)
    // merges: (e,s) (es,t) (l,o) (lo,w) — so:
    //   low → [low], lower → [low, e, r], newest → [n, e, w, est],
    //   widest → [w, i, d, est]
    val enc = docs.select(col("text"),
        TextAnalysis.bpeEncode(col("text"), merges).as("toks"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(enc("low") == List("low"))
    assert(enc("lower") == List("low", "e", "r"))
    assert(enc("newest") == List("n", "e", "w", "est"))
    assert(enc("widest") == List("w", "i", "d", "est"))
    // multi-word text flattens in order; unknown symbols pass through
    val free = docs.sparkSession.sql(
      s"SELECT graft_bpe_encode('lowest zq', '${merges.map { case (a, b) => s"$a $b" }.mkString("\\n")}') AS t")
      .head().getSeq[String](0).toList
    assert(free == List("low", "est", "z", "q"))
    // concatenating tokens reconstructs the input words exactly
    assert(enc.forall { case (w, ts) => ts.mkString == w })
  }

  test("bpeTrain merge batching equals the strictly-sequential result") {
    import graft.operators.TextAnalysis
    // corpus with enough pair-count structure to exercise both the
    // disjoint-prefix acceptance and the strict-cutoff trim
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest") ++ Seq.fill(4)("slowest") ++ Seq.fill(7)("banana bandana") ++
      Seq.fill(2)("abracadabra") ++ Seq.fill(3)("mississippi river")
    val docs = texts.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (seq1, _)  = TextAnalysis.bpeTrain(docs, "text", numMerges = 12, batchK = 1)
    val (seq8, _)  = TextAnalysis.bpeTrain(docs, "text", numMerges = 12, batchK = 8)
    val (seq16, _) = TextAnalysis.bpeTrain(docs, "text", numMerges = 12, batchK = 16)
    assert(seq8 == seq1, "batchK=8 diverged from sequential merges")
    assert(seq16 == seq1, "batchK=16 diverged from sequential merges")
  }

  test("byte-level BPE: decode(encode(x)) == x for ANY string and ANY merge table") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    // byte-level means no unknown-symbol escape hatch: unicode, emoji,
    // control chars, multi-space runs, trailing whitespace all survive
    val nasty = Seq(
      "hello world", "  leading and   triple   spaces  ", "tabs\tand\nnewlines\r\n",
      "caFÉ naïve Ḽơᶉëᶆ", "日本語のテキスト", "mixed 日本 and ascii", "🦆 emoji 🚀🎉",
      "it's we're they'll I'd you've i'm don't", "numbers 123 456.78 9e10",
      "punct!!! ???, (brackets) [and] {braces}", "a", " ", "", " nullbytes")
    val docs = nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // an arbitrary merge table — round-trip must hold regardless
    val merges = Seq(("h", "e"), ("l", "l"), ("Ġ", "w"), ("ll", "o"), ("é", "Ċ"))
    val back = docs.select(col("text"),
        TextAnalysis.bpeDecodeBytes(
          TextAnalysis.bpeEncodeBytes(col("text"), merges)).as("rt"))
      .collect()
    back.foreach(r => assert(r.getString(1) == r.getString(0),
      s"round-trip broke for ${r.getString(0).take(40)}"))
    // and with an EMPTY merge table (pure byte alphabet)
    val raw = docs.select(col("text"),
        TextAnalysis.bpeDecodeBytes(
          TextAnalysis.bpeEncodeBytes(col("text"), Nil)).as("rt")).collect()
    raw.foreach(r => assert(r.getString(1) == r.getString(0)))
    // decode REJECTS tokens outside the byte-char alphabet loudly —
    // a raw space (never produced by the byte map) and a CJK char
    // must both fail with the alphabet message, not corrupt or crash
    for (bad <- Seq("a b", "日")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT graft_bpe_byte_decode(array('$bad'))").collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("byte-level alphabet")), s"for '$bad': ${msgs(e).headOption}")
    }
  }

  test("byte-level BPE: GPT-2 pre-tokenizer and byte map semantics") {
    import graft.plans.BpeFns
    def pts(s: String): List[String] = {
      val m = BpeFns.gpt2Pretokenizer.matcher(s)
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (m.find()) out += m.group()
      out.toList
    }
    // the last space of a run attaches to the next word (`\s+(?!\S)`)
    assert(pts("a   b") == List("a", "  ", " b"))
    assert(pts("hello world") == List("hello", " world"))
    // contractions split off; punctuation groups with its leading space
    assert(pts("it's fine, isn't it?") ==
      List("it", "'s", " fine", ",", " isn", "'t", " it", "?"))
    // trailing whitespace is its own pre-token; digits split from letters
    assert(pts("x2 ab12 ") == List("x", "2", " ab", "12", " "))
    // byte map: printable ASCII identity, space → Ġ (U+0120), multi-byte
    // UTF-8 chars become one mapped char per BYTE
    assert(BpeFns.mapPretoken(" ab") == "Ġab")
    assert(BpeFns.byteToChar(0x20) == 'Ġ')
    assert(BpeFns.byteToChar('x'.toInt) == 'x')
    assert(BpeFns.mapPretoken("é").length == 2) // C3 A9
  }

  test("byte-level BPE: property round-trip over random unicode strings (kernel-level)") {
    import graft.plans.BpeFns
    import org.apache.spark.unsafe.types.UTF8String
    // 500 seeded-random strings over a hostile alphabet (ASCII, CJK,
    // emoji incl. surrogate pairs, control chars, NBSP, combining
    // marks) × a random merge table built from byte-char symbols:
    // decode(encode(x)) must equal x for EVERY input — byte-level
    // BPE's defining guarantee, independent of what was trained
    val rnd = new scala.util.Random(20260815L)
    val alphabet: IndexedSeq[String] =
      ("abc XY09.,!?'\t\n".map(_.toString) ++
        Seq("é", "日", "本", "🦆", "🚀", " ", "é", "ß", "€", "\r\n", "  "))
    def randString(): String =
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    def randSym(): String =
      (0 to rnd.nextInt(2)).map(_ => BpeFns.byteToChar(rnd.nextInt(256)).toString).mkString
    for (trial <- 0 until 50) {
      val merges = (0 until rnd.nextInt(20)).map(_ => s"${randSym()} ${randSym()}").mkString("\n")
      val m = UTF8String.fromString(merges)
      for (_ <- 0 until 10) {
        val s = randString()
        val toks = BpeFns.encodeBytes(UTF8String.fromString(s), m)
        val back = BpeFns.decodeBytes(toks).toString
        assert(back == s,
          s"trial $trial: round-trip broke for ${s.take(30).map(c => f"U+${c.toInt}%04X").mkString(" ")}")
      }
    }
  }

  test("bpeTrainBytes: merges respect pre-token bounds and encode reconstructs the corpus") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions.col
    val texts = Seq.fill(6)("the merge table") ++ Seq.fill(4)("the stable table") ++
      Seq.fill(3)("it's the tables' fault")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeTrainBytes(docs, "text", numMerges = 10)
    assert(merges.size == 10)
    // symbols stay inside the byte-char alphabet and merges are learned
    // over Ġ-prefixed words (the space travels with the word)
    assert(merges.exists { case (a, b) => (a + b).contains("Ġ") })
    val v = vocab.collect().map(_.getString(0))
    assert(v.forall(s => !s.contains(" ")), "no raw space may survive byte mapping")
    // apply: concatenated tokens rebuild each document byte-for-byte
    val enc = docs.select(col("text"),
      TextAnalysis.bpeDecodeBytes(
        TextAnalysis.bpeEncodeBytes(col("text"), merges)).as("rt")).collect()
    enc.foreach(r => assert(r.getString(1) == r.getString(0)))
    // determinism: training twice yields the identical merge sequence
    val (merges2, _) = TextAnalysis.bpeTrainBytes(docs, "text", numMerges = 10)
    assert(merges2 == merges)
  }

  test("arrayLast/FirstIndex/LastIndex, union, symmetric difference") {
    val r = spark.sql(
      """SELECT arrayLast(x -> x < 9, array(1, 5, 12, 7)) AS last_small,
        |       arrayLast(x -> x > 99, array(1, 2)) AS last_none,
        |       arrayFirstIndex(x -> x % 2 = 0, array(3, 4, 6)) AS fi,
        |       arrayLastIndex(x -> x % 2 = 0, array(3, 4, 6)) AS li,
        |       arrayFirstIndex(x -> x > 99, array(1, 2)) AS fi_none,
        |       arrayLastIndex(x -> x > 99, array(1, 2)) AS li_none,
        |       arraySort(arrayUnion(array(1, 2), array(2, 3))) AS un,
        |       arraySort(arraySymmetricDifference(array(1, 2, 3), array(2, 3, 4))) AS sd""".stripMargin).head()
    assert(r.getInt(0) == 7 && r.isNullAt(1))
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getSeq[Int](6) == Seq(1, 2, 3))
    assert(r.getSeq[Int](7) == Seq(1, 4))
  }

  test("geohash round trip and point-in-polygon") {
    val r = spark.sql(
      """SELECT geohashEncode(-5.60302734375, 42.60498046875, 5) AS gh,
        |       geohashEncode(13.361389, 38.115556, 8) AS gh2,
        |       geohashDecode('ezs42') AS dec,
        |       pointInPolygon((2.0, 2.0), array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))) AS inside,
        |       pointInPolygon((5.0, 5.0), array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))) AS outside,
        |       pointInPolygon((1.0, 0.5), array((0.0, 0.0), (4.0, 0.0), (2.0, 1.5))) AS tri""".stripMargin).head()
    assert(r.getString(0) == "ezs42") // the canonical geohash example
    assert(r.getString(1).startsWith("sq")) // Palermo, CH docs example: sqc8b49rny
    assert(r.getString(1) == "sqc8b49r")
    val dec = r.getStruct(2)
    assert(math.abs(dec.getDouble(0) - -5.603) < 0.01 && math.abs(dec.getDouble(1) - 42.605) < 0.01)
    assert(r.getBoolean(3) && !r.getBoolean(4) && r.getBoolean(5))
  }

  test("maxIntersections: half-open sweep, first-peak position") {
    // ClickHouse doc-shaped example: [1,6) [2,4) [3,5) [5,8) → peak 3 at pos 3
    val iv = Seq((1, 6), (2, 4), (3, 5), (5, 8)).toDF("s", "e")
    val r = iv.selectExpr(
      "maxIntersections(s, e) AS mi",
      "maxIntersectionsPosition(s, e) AS mip").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    // half-open: [1,2) and [2,3) never overlap
    val touch = Seq((1, 2), (2, 3)).toDF("s", "e")
    assert(touch.selectExpr("maxIntersections(s, e)").head().getLong(0) == 1L)
    // merge-order independence
    val big = Seq.tabulate(200)(i => (i % 50, i % 50 + 10)).toDF("s", "e")
    val one = big.repartition(1).selectExpr("maxIntersections(s, e)").head().getLong(0)
    val many = big.repartition(7).selectExpr("maxIntersections(s, e)").head().getLong(0)
    assert(one == many)
  }
}
