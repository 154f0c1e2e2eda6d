package graft

import org.apache.spark.sql.functions._

/** Round 17: `groupArraySorted(n)(x)` moves from
  * slice(sort_array(collect_list)) — O(group) buffer — to the
  * bounded-heap [[graft.plans.GraftGroupArraySorted]] aggregate, and
  * q16b_topn_agg computes q16's top-3-per-group through it with no
  * map-side full sort (docs/AUDIT_q16_wgl_r17.md). */
class Round17TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("groupArraySorted(n): n smallest ascending, across many partitions") {
    val df = spark.range(0, 10000).repartition(13)
      .selectExpr("id % 4 AS g", "(id * 2654435761) % 100000 AS v")
    val rows = df.groupBy($"g")
      .agg(expr("groupArraySorted(5, v)").as("top5"))
      .orderBy($"g").collect()
    val expected = df.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).sorted.take(5).toSeq).toMap
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == expected(r.getLong(0)))
    }
  }

  test("groupArraySorted(n): n larger than the group returns the whole sorted group") {
    val out = Seq((1, 30L), (1, 10L), (1, 20L)).toDF("g", "v")
      .groupBy($"g").agg(expr("groupArraySorted(99, v)").as("a"))
      .head.getSeq[Long](1)
    assert(out == Seq(10L, 20L, 30L))
  }

  test("groupArraySorted skips nulls (collect_list semantics)") {
    val out = Seq(Some(3L), None, Some(1L), None, Some(2L)).toDF("v")
      .agg(expr("groupArraySorted(2, v)").as("a")).head.getSeq[Long](0)
    assert(out == Seq(1L, 2L))
  }

  test("groupArraySorted over structs orders lexicographically — the top-k-rows kernel") {
    val df = Seq(("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 1L), ("a", 7.0, 3L))
      .toDF("g", "price", "key").repartition(4)
    val top = df.groupBy($"g")
      .agg(expr("groupArraySorted(2, struct(-price AS neg, key, price))").as("t"))
      .select(explode($"t").as("r"))
      .select($"r.key", $"r.price").as[(Long, Double)].collect().toSeq
    // price desc, key asc: (1, 9.0) then (2, 9.0)
    assert(top == Seq((1L, 9.0), (2L, 9.0)))
  }

  test("groupArraySorted on strings (binary ordering)") {
    val out = Seq("pear", "apple", "fig", "date").toDF("s")
      .agg(expr("groupArraySorted(3, s)").as("a")).head.getSeq[String](0)
    assert(out == Seq("apple", "date", "fig"))
  }

  test("parametric spelling groupArraySorted(n)(x) still parses through ChSqlParser") {
    Seq(4L, 2L, 9L, 1L).toDF("v").createOrReplaceTempView("gas_t")
    val out = spark.sql("SELECT groupArraySorted(2)(v) AS a FROM gas_t").head.getSeq[Long](0)
    assert(out == Seq(1L, 2L))
  }

  test("non-foldable n refuses at analysis") {
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("v", "n").agg(expr("groupArraySorted(n, v)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }

  test("q16b plan has zero WindowGroupLimit and only the result-set sort") {
    val df = SparkEntry.queries("q16b_topn_agg")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit"))
    assert("""(?m)(?:^|\s|\+- |:- )Sort \[""".r.findAllMatchIn(plan).size == 1,
      s"expected exactly the final ORDER BY sort, got:\n$plan")
    // partial aggregation must be map-side (two HashAggregate/ObjectHashAggregate spans)
    assert("""ObjectHashAggregate|SortAggregate|HashAggregate""".r
      .findAllMatchIn(plan).size >= 2, s"expected partial+final aggregate:\n$plan")
  }

  test("q16 and q16b agree row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q16_topn_per_group")(spark, dir).collect().toSeq
    val b = SparkEntry.queries("q16b_topn_agg")(spark, dir).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
