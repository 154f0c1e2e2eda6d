package graft

import org.apache.spark.sql.functions._

/** The reference's migrated app code emits ClickHouse-dialect SQL
  * (corpus orm_none.txt:483-489); these specs run that SQL verbatim
  * through spark.sql and check it against DataFrame equivalents. */
class ChDialectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    val base = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    Seq.tabulate(300) { i =>
      (new java.sql.Timestamp(base.getTime + i.toLong * 86400000 / 4),
       (i % 7).toLong, i.toDouble, if (i % 3 == 0) "purchase" else "view",
       s"""{"k": ${i % 10}}""")
    }.toDF("date", "user_id", "amount", "etype", "props")
      .createOrReplaceTempView("expenses")
  }

  test("the corpus' canonical monthly rollup runs verbatim") {
    view
    val out = spark.sql(
      """SELECT toStartOfMonth(date) as month,
               count(*) as count,
               sum(amount) as total
         FROM expenses
         GROUP BY toStartOfMonth(date)
         ORDER BY month DESC""").collect()
    assert(out.length == 3) // Jan, Feb, Mar
    assert(out.map(_.getLong(1)).sum == 300L)
  }

  test("parametric-aggregate spelling parses: quantile(0.5)(x), topK(k)(v)") {
    view
    // the ClickHouse double-call-list syntax, verbatim
    val r = spark.sql(
      """SELECT quantile(0.5)(amount) AS p50,
               quantiles(0.25, 0.75)(amount)[0] AS p25,
               median(amount) AS med,
               topK(2)(etype) AS top_types
         FROM expenses""").head()
    assert(r.getDouble(0) == 149.5)
    assert(r.getDouble(1) == 74.75)
    assert(r.getDouble(2) == 149.5)
    // view has 200 'view' vs 100 'purchase' → count-desc order
    assert(r.getSeq[String](3) == Seq("view", "purchase"))
    // single-list spellings must pass through the rewriter untouched
    assert(graft.plans.ChSqlParser.rewriteParametric(
      "SELECT quantile(0.5, x) FROM t") == "SELECT quantile(0.5, x) FROM t")
    // and occurrences inside string literals don't have the call-call
    // shape, so they're left alone too
    val literal = "SELECT 'quantile(0.5) is (not) a call' FROM t"
    assert(graft.plans.ChSqlParser.rewriteParametric(literal) == literal)
  }

  test("GraftTopK is exact, deterministic, and merge-order independent") {
    // ties broken by value asc; result independent of partition layout
    val df = Seq.tabulate(600)(i => (i % 6).toLong).toDF("v")
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .agg(expr("topK(3)(v)").as("top")).head().getSeq[Long](0)
      assert(got == Seq(0L, 1L, 2L)) // all counts equal → value asc
    }
    val skewed = (Seq.fill(50)(9L) ++ Seq.fill(30)(4L) ++ Seq.fill(30)(2L) ++ Seq.fill(5)(7L))
      .toDF("v").repartition(5)
    assert(skewed.agg(expr("topK(3)(v)")).head().getSeq[Long](0) == Seq(9L, 2L, 4L))
    // nulls don't count; k larger than distinct values returns them all
    val withNulls = Seq[java.lang.Long](1L, null, 1L, 2L, null).toDF("v")
    assert(withNulls.agg(expr("topK(10)(v)")).head().getSeq[Long](0) == Seq(1L, 2L))
  }

  test("corpus scalar functions: empty/notEmpty/ifNull/intDiv/modulo/multiIf") {
    val r = spark.sql(
      """SELECT if(empty(''), 'E', 'N'), if(empty(CAST(NULL AS STRING)), 'E', 'N'),
               if(notEmpty('x'), 'Y', 'N'),
               ifNull(CAST(NULL AS INT), 7),
               intDiv(-7, 2), modulo(-7, 2),
               multiIf(1 > 2, 'a', 3 > 2, 'b', 'c')""").head()
    assert(r.getString(0) == "E" && r.getString(1) == "E" && r.getString(2) == "Y")
    assert(r.getInt(3) == 7)
    assert(r.getLong(4) == -3L) // C-style integral division truncates toward zero
    assert(r.getInt(5) == -1)   // remainder keeps the dividend's sign (NOT pmod)
    assert(r.getString(6) == "b")
  }

  test("conditional/argMax/uniq/JSON dialect functions resolve natively") {
    view
    val r = spark.sql(
      """SELECT countIf(etype = 'purchase') AS p,
               sumIf(amount, etype = 'purchase') AS pv,
               argMax(etype, amount) AS last_type,
               uniq(user_id) AS u,
               JSONExtractInt(props, 'k') AS k
         FROM expenses GROUP BY JSONExtractInt(props, 'k')
         ORDER BY k LIMIT 1""").head()
    assert(r.getLong(0) == 10L)               // i % 10 == 0 && i % 3 == 0 → 10 of 30
    assert(r.getLong(3) == 7L)                // HLL exact at tiny cardinality
    assert(r.getLong(4) == 0L)
    // plan stays native: no UDFs, aggregate is partial-aggregable
    val plan = spark.sql("SELECT countIf(etype='purchase') FROM expenses")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("partial_count"))
  }
}
