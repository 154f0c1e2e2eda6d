package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

import graft.plans.ChDialect

/** Round-19 ADVICE items, pinned:
  *  1. TopKRewrite only strips a WindowGroupLimit that verifiably
  *     corresponds to the rewritten window (Round19RankTopKSpec owns
  *     that one);
  *  2. malformed rewrite conf values fall back to defaults instead of
  *     failing the optimizer (also Round19RankTopKSpec);
  *  3. cumAccType fails loudly on an unresolved child — a silent
  *     Double default would reintroduce the integral-sums-in-Double
  *     bug the round-18 fuzz fixed, on any direct-construction path;
  *  4. STALENESS fill keeps a genuinely-NULL passenger on a SOURCE
  *     row NULL (CH outputs original rows unchanged); only GENERATED
  *     fill rows take the typed default.
  */
class Round19AdviceSpec extends SparkSpec {
  import spark.implicits._

  test("cumAccType: an unresolved child fails loudly at build time, never bakes Double") {
    val fns = ChDialect.functions.toMap
    for (name <- Seq("arrayCumSum", "arrayCumSumNonNegative", "arrayDifference")) {
      val e = intercept[IllegalStateException](fns(name)(Seq(UnresolvedAttribute("xs"))))
      assert(e.getMessage.contains("UNRESOLVED"), s"$name: ${e.getMessage}")
    }
  }

  test("STALENESS (int axis): NULL passenger on a source row stays NULL; fill rows default") {
    Seq((1, Some("a")), (5, Option.empty[String]), (12, Some("c")))
      .toDF("x", "tag").createOrReplaceTempView("st_null19")
    val rows = spark.sql(
      "SELECT x, tag FROM st_null19 ORDER BY x WITH FILL STALENESS 3")
      .collect().map(r => (r.getInt(0), Option(r.getString(1))))
    // each source row at v fills v+1, v+2 (bounded by staleness 3 and
    // the next source row); source x=5 carries its ORIGINAL NULL
    assert(rows.toSeq == Seq(
      (1, Some("a")), (2, Some("")), (3, Some("")),
      (5, None), (6, Some("")), (7, Some("")),
      (12, Some("c")), (13, Some("")), (14, Some(""))))
  }

  test("STALENESS (date axis): NULL passenger on a source row stays NULL; fill rows default") {
    Seq(("2024-01-01", Some("a")), ("2024-01-10", Option.empty[String]))
      .toDF("ds", "tag")
      .selectExpr("CAST(ds AS DATE) AS d", "tag")
      .createOrReplaceTempView("st_null19d")
    val rows = spark.sql(
      """SELECT d, tag FROM st_null19d
        |ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, Option(r.getString(1))))
    assert(rows.toSeq == Seq(
      ("2024-01-01", Some("a")), ("2024-01-02", Some("")), ("2024-01-03", Some("")),
      ("2024-01-10", None), ("2024-01-11", Some("")), ("2024-01-12", Some(""))))
  }

  test("STALENESS with a prefix group: per-group runs keep source NULLs NULL") {
    Seq(("g1", 1, Some("a")), ("g1", 5, Option.empty[String]), ("g2", 2, Some("b")))
      .toDF("g", "x", "tag").createOrReplaceTempView("st_null19g")
    val rows = spark.sql(
      "SELECT g, x, tag FROM st_null19g ORDER BY g, x WITH FILL STALENESS 2")
      .collect().map(r => (r.getString(0), r.getInt(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq(
      ("g1", 1, Some("a")), ("g1", 2, Some("")),
      ("g1", 5, None), ("g1", 6, Some("")),
      ("g2", 2, Some("b")), ("g2", 3, Some(""))))
  }
}
