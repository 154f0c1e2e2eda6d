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

  test("type/date dialect functions: toXxx family, add*/dateDiff boundary semantics") {
    val r = spark.sql(
      """SELECT toFloat64('2.5'), toInt64('7'), toString(42), toDate('2026-03-15'),
               toYear(TIMESTAMP '2026-03-15 13:45:00'),
               toQuarter(TIMESTAMP '2026-03-15 13:45:00'),
               toDayOfWeek(TIMESTAMP '2026-03-15 13:45:00'),  -- Sunday → 7 (ISO)
               toHour(TIMESTAMP '2026-03-15 13:45:00'),
               toYYYYMMDD(TIMESTAMP '2026-03-15 13:45:00'),
               addDays(TIMESTAMP '2026-03-15 13:45:00', 3),
               subtractMonths(TIMESTAMP '2026-03-15 13:45:00', 2),
               formatDateTime(TIMESTAMP '2026-03-15 13:45:00', 'yyyy/MM/dd')""").head()
    assert(r.getDouble(0) == 2.5 && r.getLong(1) == 7L && r.getString(2) == "42")
    assert(r.getDate(3).toString == "2026-03-15")
    assert(r.getInt(4) == 2026 && r.getInt(5) == 1 && r.getInt(6) == 7 && r.getInt(7) == 13)
    assert(r.getString(8) == "20260315")
    assert(r.getTimestamp(9).toString == "2026-03-18 13:45:00.0")
    assert(r.getTimestamp(10).toString == "2026-01-15 13:45:00.0")
    assert(r.getString(11) == "2026/03/15")
    // dateDiff counts BOUNDARY crossings (ClickHouse), not elapsed units
    val d = spark.sql(
      """SELECT dateDiff('day',   TIMESTAMP '2026-03-14 23:59:00', TIMESTAMP '2026-03-15 00:01:00'),
               dateDiff('hour',  TIMESTAMP '2026-03-15 01:59:59', TIMESTAMP '2026-03-15 02:00:01'),
               dateDiff('month', DATE '2026-01-31', DATE '2026-02-01'),
               dateDiff('year',  DATE '2025-12-31', DATE '2026-01-01'),
               dateDiff('week',  DATE '2026-03-15', DATE '2026-03-16')  -- Sun → Mon crosses ISO week
        """).head()
    assert(d.getLong(0) == 1L && d.getLong(1) == 1L)
    assert(d.getLong(2) == 1L && d.getLong(3) == 1L && d.getLong(4) == 1L)
  }

  test("string/array dialect functions resolve with CH argument orders") {
    val r = spark.sql(
      """SELECT position('Hello world', 'world'), position('Hello', 'zzz'),
               splitByChar(',', 'a,b,,c'),
               replaceAll('a.b.c', '.', '-'),
               arrayStringConcat(array('x','y','z'), '|'),
               has(array(1, 2, 3), 2), indexOf(array(7, 8), 8),
               arrayUniq(array(1, 1, 2)), arraySlice(array(1,2,3,4), 2, 2),
               lengthUTF8('héllo'), leftPad('7', 3, '0')""").head()
    assert(r.getInt(0) == 7 && r.getInt(1) == 0)
    assert(r.getSeq[String](2) == Seq("a", "b", "", "c"))
    assert(r.getString(3) == "a-b-c")
    assert(r.getString(4) == "x|y|z")
    assert(r.getBoolean(5) && r.getLong(6) == 2L)
    assert(r.getInt(7) == 2)
    assert(r.getSeq[Int](8) == Seq(2, 3))
    assert(r.getInt(9) == 5)
    assert(r.getString(10) == "007")
  }

  test("aggregate dialect functions: uniqExact/anyLast/avgWeighted/groupUniqArray") {
    view
    val r = spark.sql(
      """SELECT uniqExact(user_id) AS u,
               anyLast(etype) AS last_e,
               avgWeighted(amount, user_id + 1) AS aw,
               groupUniqArray(etype) AS types
         FROM expenses""").head()
    assert(r.getLong(0) == 7L)
    assert(Set("view", "purchase").contains(r.getString(1)))
    assert(r.getDouble(2) > 0)
    assert(r.getSeq[String](3) == Seq("purchase", "view"))
    // the drizzle corpus' exact aggregate spelling parses and runs
    val corpus = spark.sql(
      "SELECT COUNT(*) as count, sum(toFloat64(amount)) as total FROM expenses").head()
    assert(corpus.getLong(0) == 300L && corpus.getDouble(1) == 44850.0)
    val monthly = spark.sql(
      """SELECT toStartOfMonth(toDate(date)) as month, sum(toFloat64(amount)) as total
         FROM expenses GROUP BY month ORDER BY month""").collect()
    assert(monthly.length == 3)
  }

  test("array HOFs in ClickHouse argument order (lambda first)") {
    val r = spark.sql(
      """SELECT arrayMap(x -> x * 2, array(1, 2, 3)),
               arrayFilter(x -> x % 2 = 0, array(1, 2, 3, 4)),
               arrayExists(x -> x > 3, array(1, 2)),
               arrayAll(x -> x > 0, array(1, 2)),
               arrayCount(x -> x > 1, array(1, 2, 3)),
               arrayFirst(x -> x > 1, array(1, 2, 3)),
               arraySum(array(1, 2, 3)),
               arraySum(x -> x * x, array(1, 2, 3)),
               round(arrayAvg(array(1.0, 2.0, 6.0)), 4)""").head()
    assert(r.getSeq[Int](0) == Seq(2, 4, 6))
    assert(r.getSeq[Int](1) == Seq(2, 4))
    assert(!r.getBoolean(2) && r.getBoolean(3))
    assert(r.getInt(4) == 2 && r.getInt(5) == 2)
    assert(r.getDouble(6) == 6.0 && r.getDouble(7) == 14.0)
    assert(r.getDouble(8) == 3.0)
  }

  test("sumMap/maxMap/minMap combine parallel arrays element-wise by key") {
    view
    Seq((Seq("a", "b"), Seq(1L, 10L)), (Seq("b", "c"), Seq(5L, 7L)), (Seq("a"), Seq(2L)))
      .toDF("ks", "vs").repartition(3).createOrReplaceTempView("maps")
    val r = spark.sql(
      """SELECT sumMap(ks, vs) AS s, maxMap(ks, vs) AS mx, minMap(ks, vs) AS mn
         FROM maps""").head()
    val s = r.getStruct(0)
    assert(s.getSeq[String](0) == Seq("a", "b", "c"))
    assert(s.getSeq[Long](1) == Seq(3L, 15L, 7L))
    assert(r.getStruct(1).getSeq[Long](1) == Seq(2L, 10L, 7L))
    assert(r.getStruct(2).getSeq[Long](1) == Seq(1L, 5L, 7L))
    // fractional values combine in Double
    Seq((Seq("x"), Seq(0.5)), (Seq("x"), Seq(0.25))).toDF("ks", "vs")
      .createOrReplaceTempView("dmaps")
    val d = spark.sql("SELECT sumMap(ks, vs) AS s FROM dmaps").head().getStruct(0)
    assert(d.getSeq[Double](1) == Seq(0.75))
  }

  test("PREWHERE and GROUP BY ... WITH TOTALS rewrite to Spark equivalents") {
    view
    val pre = spark.sql(
      "SELECT count(*) AS c FROM expenses PREWHERE etype = 'purchase'").head()
    assert(pre.getLong(0) == 100L)
    val tot = spark.sql(
      """SELECT etype, count(*) AS c FROM expenses
         GROUP BY etype WITH TOTALS ORDER BY etype NULLS FIRST""").collect()
    assert(tot.length == 3) // totals row + 2 groups
    assert(tot.head.isNullAt(0) && tot.head.getLong(1) == 300L)
    assert(tot.map(_.getLong(1)).sum == 600L)
    // a subquery's own GROUP BY is not miscaptured by the rewrite
    val sub = spark.sql(
      """SELECT n, count(*) AS c FROM
           (SELECT etype, count(*) AS n FROM expenses GROUP BY etype) t
         GROUP BY n WITH TOTALS ORDER BY n NULLS FIRST""").collect()
    assert(sub.length == 3)
    assert(sub.head.isNullAt(0) && sub.head.getLong(1) == 2L)
  }

  test("ClickHouse named query parameters bind through spark.sql args") {
    view
    val r = spark.sql(
      """SELECT COUNT(*) as count, sum(amount) as total FROM expenses
         WHERE 1=1 AND etype = {t:String} AND amount >= {min_amt:Float64}""",
      Map("t" -> "purchase", "min_amt" -> 0.0)).head()
    assert(r.getLong(0) == 100L)
    // parenthesized CH types like Array(String) and Decimal(10, 2) also match
    assert(graft.plans.ChSqlParser.rewriteParametric("x IN {xs:Array(String)} AND y = {d:Decimal(10, 2)}")
      == "x IN :xs AND y = :d")
  }

  test("SAMPLE clause maps to TABLESAMPLE and samples proportionally") {
    view
    assert(graft.plans.ChSqlParser.rewriteParametric("FROM t SAMPLE 0.5 WHERE x")
      == "FROM t TABLESAMPLE (50.0 PERCENT) WHERE x")
    val n = spark.sql("SELECT count(*) AS c FROM expenses SAMPLE 0.5").head().getLong(0)
    assert(n > 50 && n < 550, s"sampled $n of 600")  // Bernoulli around 300
  }

  test("SAMPLE on a table with a registered sample key is deterministic") {
    view
    graft.operators.Sampling.registerSampleBy("expenses", "CAST(user_id AS STRING)")
    val rewritten = graft.plans.ChSqlParser.rewriteParametric(
      "SELECT count(*) AS c FROM expenses SAMPLE 0.25")
    assert(rewritten.contains("md5") && rewritten.contains("< 64"),
      s"expected the content-addressed bucket filter, got: $rewritten")
    // identical draw on every run — the whole point
    val a = spark.sql("SELECT count(*) AS c FROM expenses SAMPLE 0.25").head().getLong(0)
    val b = spark.sql("SELECT count(*) AS c FROM expenses SAMPLE 0.25").head().getLong(0)
    assert(a == b && a > 0 && a < 600)
    // and it matches the Sampling operator's own bucket math
    val direct = graft.operators.Sampling.sample(
      spark.table("expenses"), expr("CAST(user_id AS STRING)"), 0.25).count()
    assert(a == direct)
    // SAMPLE k OFFSET m: four disjoint quarter-slices partition the table
    val total = spark.table("expenses").count()
    val slices = Seq(0.0, 0.25, 0.5, 0.75).map { off =>
      spark.sql(s"SELECT count(*) AS c FROM expenses SAMPLE 0.25 OFFSET $off")
        .head().getLong(0)
    }
    assert(slices.sum == total, s"slices $slices must partition $total rows")
  }

  test("dictGetHierarchy/dictIsIn walk a registered hierarchy via one broadcast probe") {
    import spark.implicits._
    // 0 ← 1 ← 3, 0 ← 2; 9 is absent from the dictionary
    graft.operators.Dictionaries.registerHierarchical("org", "id", "boss",
      () => Seq((0, Option.empty[Int]), (1, Some(0)), (2, Some(0)), (3, Some(1)))
        .toDF("id", "boss"))
    Seq(0, 1, 2, 3, 9).toDF("emp").createOrReplaceTempView("emps")
    val rows = spark.sql(
      """SELECT emp, dictGetHierarchy('org', emp) AS chain,
                dictIsIn('org', emp, 0) AS under_root,
                dictIsIn('org', emp, 1) AS under_one
         FROM emps ORDER BY emp""").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toList, r.getBoolean(2), r.getBoolean(3)))
    assert(rows.toList == List(
      (0, List(0L), true, false),
      (1, List(1L, 0L), true, true),
      (2, List(2L, 0L), true, false),
      (3, List(3L, 1L, 0L), true, true),
      (9, List(9L), false, false))) // missing key: chain is just [key]
    // downward walkers on the same hierarchy: children, full subtree,
    // level-bounded subtree; leaves and missing keys yield []
    val downs = spark.sql(
      """SELECT emp, dictGetChildren('org', emp) AS kids,
                dictGetDescendants('org', emp) AS all_desc,
                dictGetDescendants('org', emp, 1) AS lvl1
         FROM emps ORDER BY emp""").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toList,
                 r.getSeq[Long](2).toList, r.getSeq[Long](3).toList))
    assert(downs.toList == List(
      (0, List(1L, 2L), List(1L, 2L, 3L), List(1L, 2L)),
      (1, List(3L), List(3L), List(3L)),
      (2, Nil, Nil, Nil),
      (3, Nil, Nil, Nil),
      (9, Nil, Nil, Nil)))
    // a cyclic hierarchy fails loudly instead of looping
    graft.operators.Dictionaries.registerHierarchical("cyc", "id", "boss",
      () => Seq((1, Some(2)), (2, Some(1))).toDF("id", "boss"))
    val e = intercept[Exception] {
      spark.sql("SELECT dictGetHierarchy('cyc', emp) AS c FROM emps").collect()
    }
    assert(e.getMessage.contains("cycle") ||
      (e.getCause != null && e.getCause.getMessage.contains("cycle")))
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

  test("the dialect registry has no duplicate names (a later entry would shadow an earlier one)") {
    // registration is Seq-ordered and last-wins, so a duplicate key is
    // silently dead code — catch it here instead
    val dups = graft.plans.ChDialect.functions.map(_._1)
      .groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate dialect registrations: ${dups.toSeq.sorted.mkString(", ")}")
  }
}
