package graft

import org.apache.spark.sql.functions._

/** Round-4 dialect surface: the ARRAY JOIN clause (zip semantics,
  * LEFT form, single-array form) and GROUP BY WITH ROLLUP/CUBE. */
class DialectRound4Spec extends SparkSpec {
  import spark.implicits._

  private lazy val arrView: Unit =
    Seq(
      (1L, Seq(10, 20, 30), Seq("a", "b", "c")),
      (2L, Seq(5), Seq("x")),
      (3L, Seq.empty[Int], Seq.empty[String]),
    ).toDF("id", "ns", "ss").createOrReplaceTempView("aj_t")

  test("ARRAY JOIN unrolls a single array") {
    arrView
    val out = spark.sql(
      """SELECT id, n FROM aj_t ARRAY JOIN ns AS n ORDER BY id, n""")
      .as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 10), (1L, 20), (1L, 30), (2L, 5)))
  }

  test("ARRAY JOIN zips multiple arrays positionally (no cross product)") {
    arrView
    val out = spark.sql(
      """SELECT id, n, s FROM aj_t ARRAY JOIN ns AS n, ss AS s ORDER BY id, n""")
      .as[(Long, Int, String)].collect()
    // 3 elements + 1 element = 4 rows, NOT 3*3 + 1
    assert(out.toSeq == Seq((1L, 10, "a"), (1L, 20, "b"), (1L, 30, "c"), (2L, 5, "x")))
  }

  test("LEFT ARRAY JOIN keeps empty-array rows (null element)") {
    arrView
    val out = spark.sql(
      """SELECT id, n FROM aj_t LEFT ARRAY JOIN ns AS n ORDER BY id, n""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
    assert(out.toSeq == Seq((1L, 10), (1L, 20), (1L, 30), (2L, 5), (3L, -1)))
  }

  test("ARRAY JOIN composes with expressions and a WHERE boundary") {
    arrView
    val out = spark.sql(
      """SELECT id, n2 FROM aj_t ARRAY JOIN arrayMap(x -> x * 2, ns) AS n2
         WHERE id = 1 ORDER BY n2""").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 20), (1L, 40), (1L, 60)))
  }

  test("alias-less ARRAY JOIN: bare idents execute (round 16), expressions refuse") {
    arrView
    // a bare column ident shadows the array with its element
    val out = spark.sql(
      "SELECT id, ns FROM aj_t ARRAY JOIN ns WHERE id = 1 ORDER BY ns")
      .as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 10), (1L, 20), (1L, 30)))
    // an alias-less EXPRESSION still passes through → loud parse failure
    intercept[Exception](spark.sql(
      "SELECT id FROM aj_t ARRAY JOIN arrayMap(x -> x * 2, ns)").collect())
  }

  test("topKWeighted: weight-ordered, deterministic ties, partition-independent") {
    val df = Seq(("a", 1L), ("b", 5L), ("c", 5L), ("a", 2L), ("d", 10L)).toDF("v", "w")
    for (parts <- Seq(1, 4)) {
      val got = df.repartition(parts)
        .agg(expr("topKWeighted(3)(v, w)")).head().getSeq[String](0)
      // d=10, b=5, c=5 (tie → value asc), a=3
      assert(got == Seq("d", "b", "c"))
    }
    // weight ≡ 1 degenerates to topK's count ordering
    val ones = Seq("x", "y", "x", "z", "x", "y").toDF("v").withColumn("w", lit(1L))
    assert(ones.agg(expr("topKWeighted(2)(v, w)")).head().getSeq[String](0) == Seq("x", "y"))
    // null values and null weights are skipped
    val nulls = Seq(("a", java.lang.Long.valueOf(3L)), (null, java.lang.Long.valueOf(9L)), ("b", null))
      .toDF("v", "w")
    assert(nulls.agg(expr("topKWeighted(5)(v, w)")).head().getSeq[String](0) == Seq("a"))
  }

  test("quantileExactWeighted: nearest-rank over the weighted multiset") {
    // multiset {1×1, 2×1, 3×8} → median = 3; q=0 → min; q=1 → max
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 8L)).toDF("v", "w")
    for (parts <- Seq(1, 3)) {
      val r = df.repartition(parts).selectExpr(
        "quantileExactWeighted(0.5)(v, w) AS med",
        "quantileExactWeighted(0)(v, w) AS lo",
        "quantileExactWeighted(1.0)(v, w) AS hi").head()
      assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 3.0)
    }
    // unit weights reduce to the classic nearest-rank quantile
    val u = Seq.tabulate(10)(i => (i + 1.0, 1L)).toDF("v", "w")
    assert(u.selectExpr("quantileExactWeighted(0.3)(v, w)").head().getDouble(0) == 3.0)
    // empty group → null
    assert(df.where("v < 0").selectExpr("quantileExactWeighted(0.5)(v, w)").head().isNullAt(0))
    // zero-weight values are NOT in the weighted multiset: q=0 must
    // return the smallest positively-weighted value, and a group of
    // only zero weights has no quantile at all
    val zw = Seq((1.0, 0L), (2.0, 3L), (3.0, 1L)).toDF("v", "w")
    val z = zw.selectExpr(
      "quantileExactWeighted(0)(v, w) AS lo",
      "quantileExactWeighted(0.5)(v, w) AS med").head()
    assert(z.getDouble(0) == 2.0 && z.getDouble(1) == 2.0)
    val allZero = Seq((1.0, 0L), (2.0, 0L)).toDF("v", "w")
    assert(allZero.selectExpr("quantileExactWeighted(0.5)(v, w)").head().isNullAt(0))
  }

  test("WITH ROLLUP and WITH CUBE run in ClickHouse spelling") {
    Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L))
      .toDF("g1", "g2", "v").createOrReplaceTempView("ru_t")
    val roll = spark.sql(
      """SELECT coalesce(g1, 'ALL') AS g1, coalesce(g2, 'ALL') AS g2, sum(v) AS s
         FROM ru_t GROUP BY g1, g2 WITH ROLLUP ORDER BY g1, g2""").as[(String, String, Long)].collect()
    assert(roll.toSeq == Seq(
      ("ALL", "ALL", 7L), ("a", "ALL", 3L), ("a", "x", 1L), ("a", "y", 2L),
      ("b", "ALL", 4L), ("b", "x", 4L)))
    val cube = spark.sql(
      """SELECT count(*) AS n FROM (
           SELECT g1, g2, sum(v) AS s FROM ru_t GROUP BY g1, g2 WITH CUBE)""").head().getLong(0)
    // 3 leaf + 2 g1-subtotals + 2 g2-subtotals + 1 grand total
    assert(cube == 8L)
  }
}
