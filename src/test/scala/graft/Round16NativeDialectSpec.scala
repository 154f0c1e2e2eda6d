package graft

/** Round 16: CH spellings that Spark's own grammar already covers —
  * pinned so the surface is a contract, not an accident of the
  * delegate's grammar (a Spark upgrade or a rewrite regression that
  * breaks them surfaces here, and SURVEY can claim them honestly):
  * GROUP BY ALL, ORDER BY ALL, the ILIKE operator, and the named
  * WINDOW clause. Plus the KILL refusal: process-list statements
  * refuse loudly with the Spark cancellation seam named. */
class Round16NativeDialectSpec extends SparkSpec {
  import spark.implicits._

  private def mkView(): Unit =
    Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0))
      .toDF("cat", "n", "v").createOrReplaceTempView("nat_src")

  test("GROUP BY ALL groups by every non-aggregate select item") {
    mkView()
    val rows = spark.sql(
      "SELECT cat, sum(v) AS total FROM nat_src GROUP BY ALL ORDER BY cat")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("a", 30.0), ("b", 30.0)))
  }

  test("ORDER BY ALL sorts by every select item left to right") {
    mkView()
    val rows = spark.sql("SELECT cat, n FROM nat_src ORDER BY ALL")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("ILIKE matches case-insensitively as an operator") {
    Seq("Alpha", "BETA", "gamma").toDF("s").createOrReplaceTempView("nat_ilike")
    val hits = spark.sql("SELECT s FROM nat_ilike WHERE s ILIKE '%a' ORDER BY s")
      .collect().map(_.getString(0))
    assert(hits.toSeq == Seq("Alpha", "BETA", "gamma"))
    val one = spark.sql("SELECT s FROM nat_ilike WHERE s ILIKE 'beta'")
      .collect().map(_.getString(0))
    assert(one.toSeq == Seq("BETA"))
  }

  test("named WINDOW clause resolves through OVER w") {
    mkView()
    val rows = spark.sql(
      """SELECT cat, n, sum(v) OVER w AS running
        |FROM nat_src
        |WINDOW w AS (PARTITION BY cat ORDER BY n
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY cat, n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 30.0)))
  }

  test("KILL QUERY / KILL MUTATION refuse loudly with the Spark seam named") {
    val e1 = intercept[UnsupportedOperationException](
      spark.sql("KILL QUERY WHERE query_id = 'abc'").collect())
    assert(e1.getMessage.contains("cancelJobGroup"))
    val e2 = intercept[UnsupportedOperationException](
      spark.sql("KILL MUTATION WHERE mutation_id = 'm1'").collect())
    assert(e2.getMessage.contains("synchronously"))
  }
}
