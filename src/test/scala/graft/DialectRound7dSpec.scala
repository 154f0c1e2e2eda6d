package graft

/** Fourth round-7 widening wave: special math (erf/gamma via the
  * commons-math3 kernels Spark ships), min2/max2, the
  * arrayFill/arraySplit family, hasSubstr/arrayElementOrNull,
  * toNullable, uptime, and the rand tail. Doc-example values pinned
  * where ClickHouse's documentation gives them. */
class DialectRound7dSpec extends SparkSpec {

  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql AS v").head().getDouble(0)

  test("erf/erfc/lgamma/tgamma: textbook values") {
    assert(math.abs(d("erf(0.5)") - 0.5204998778130465) < 1e-12)
    assert(math.abs(d("erfc(0.5)") - 0.4795001221869535) < 1e-12)
    assert(math.abs(d("erf(0.0)")) < 1e-15)
    // Γ(4) = 6, lnΓ(4) = ln 6
    assert(math.abs(d("tgamma(4.0)") - 6.0) < 1e-9)
    assert(math.abs(d("lgamma(4.0)") - math.log(6.0)) < 1e-12)
    // Γ(0.5) = √π
    assert(math.abs(d("tgamma(0.5)") - math.sqrt(math.Pi)) < 1e-9)
    assert(d("min2(3, 1.5)") == 1.5 && d("max2(3, 1.5)") == 3.0)
  }

  test("arrayFill/arrayReverseFill: CH doc example and edges") {
    def ints(sql: String): Seq[Int] =
      spark.sql(s"SELECT $sql AS v").head().getSeq[Int](0)
    // CH doc: arrayFill(x -> not isNull(x), [1, null, 3]) carries values forward
    assert(spark.sql(
      "SELECT arrayFill(x -> x is not null, array(1, CAST(null AS INT), 3, CAST(null AS INT))) AS v")
      .head().getSeq[Integer](0) == Seq(1, 1, 3, 3))
    assert(ints("arrayFill(x -> x != 0, array(1, 0, 2, 0, 0))") == Seq(1, 1, 2, 2, 2))
    // leading failures keep themselves until something passes
    assert(ints("arrayFill(x -> x != 0, array(0, 0, 5, 0))") == Seq(0, 0, 5, 5))
    assert(ints("arrayReverseFill(x -> x != 0, array(0, 1, 0, 3, 0))") == Seq(1, 1, 3, 3, 0))
    assert(ints("arrayFill(x -> x != 0, array())") == Seq())
    // two-array form: flags drive, values fill
    assert(ints("arrayFill((x, f) -> f = 1, array(9, 8, 7), array(1, 0, 1))") == Seq(9, 9, 7))
  }

  test("arraySplit/arrayReverseSplit: CH doc examples") {
    def grp(sql: String): Seq[Seq[Int]] =
      spark.sql(s"SELECT $sql AS v").head().getSeq[Seq[Int]](0)
    // CH docs: arraySplit((x, y) -> y, [1,2,3,4,5], [1,0,0,1,0]) = [[1,2,3],[4,5]]
    assert(grp("arraySplit((x, y) -> y = 1, array(1,2,3,4,5), array(1,0,0,1,0))")
      == Seq(Seq(1, 2, 3), Seq(4, 5)))
    // CH docs: arrayReverseSplit same input = [[1],[2,3,4],[5]]
    assert(grp("arrayReverseSplit((x, y) -> y = 1, array(1,2,3,4,5), array(1,0,0,1,0))")
      == Seq(Seq(1), Seq(2, 3, 4), Seq(5)))
    // single-array predicate form; no cut before the first element
    assert(grp("arraySplit(x -> x < 0, array(1, 2, -3, 4))") == Seq(Seq(1, 2), Seq(-3, 4)))
    assert(grp("arraySplit(x -> true, array(7))") == Seq(Seq(7)))
    assert(grp("arraySplit(x -> true, array())") == Seq())
    // flagged LAST element opens no trailing empty group
    assert(grp("arrayReverseSplit(x -> x = 3, array(1, 2, 3))") == Seq(Seq(1, 2, 3)))
  }

  test("hasSubstr: contiguous subsequence, order matters") {
    def b(sql: String): Boolean = spark.sql(s"SELECT $sql AS v").head().getBoolean(0)
    assert(b("hasSubstr(array(1,2,3,4), array(2,3))"))
    assert(!b("hasSubstr(array(1,2,3,4), array(3,2))"))
    assert(!b("hasSubstr(array(1,2), array(1,2,3))"))
    assert(b("hasSubstr(array(1,2), array())"))
    assert(b("hasSubstr(array('a','b','c'), array('b','c'))"))
  }

  test("arrayElementOrNull: null instead of errors on 0 and out-of-range") {
    val r = spark.sql(
      """SELECT arrayElementOrNull(array(10, 20), 1) AS a,
                arrayElementOrNull(array(10, 20), -1) AS b,
                arrayElementOrNull(array(10, 20), 5) AS c,
                arrayElementOrNull(array(10, 20), 0) AS z""").head()
    assert(r.getInt(0) == 10 && r.getInt(1) == 20)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("toNullable is identity; uptime is a sane non-negative count") {
    val r = spark.sql("SELECT toNullable(42) AS x, uptime() AS u").head()
    assert(r.getInt(0) == 42)
    assert(r.getLong(1) >= 0L && r.getLong(1) < 86400L)
  }

  test("rand tail: ranges, lengths, per-query constancy") {
    val r = spark.sql(
      """SELECT rand64() AS r64, randConstant() AS rc,
                length(randomPrintableASCII(12)) AS n12,
                randomPrintableASCII(8) AS s8, randomString(5) AS s5
         FROM range(3)""").collect()
    assert(r.length == 3)
    // randConstant: same value on every row of the query
    assert(r.map(_.getLong(1)).distinct.length == 1)
    assert(r.forall(_.getInt(2) == 12))
    assert(r.forall(row => row.getString(3).length == 8 &&
      row.getString(3).forall(c => c >= ' ' && c <= '~')))
    assert(r.forall(_.getString(4).length == 5))
    // block introspection refuses loudly
    val e = intercept[Exception](spark.sql("SELECT blockNumber()").collect())
    assert(e.getMessage.contains("spark_partition_id"))
  }
}
