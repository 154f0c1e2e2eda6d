package graft

import java.sql.{Date, Timestamp}

/** Round 16: Date/DateTime WITH FILL axes (the round-15 verdict's top
  * item). Pins true calendar month arithmetic, TO-exclusivity on the
  * date grid, CH's bare-integer step units (days on Date, seconds on
  * DateTime), QUARTER lowering, INTERPOLATE composing with a date
  * axis, and the refusal edges (mixed bound kinds, unknown units,
  * malformed literals pass through to fail loudly at parse). */
class Round16FillSpec extends SparkSpec {
  import spark.implicits._

  private def mkDateView(): Unit =
    Seq(
      (Date.valueOf("2024-01-01"), 10L),
      (Date.valueOf("2024-04-01"), 40L),
      (Date.valueOf("2024-09-01"), 90L), // off-grid (past TO) — must survive
    ).toDF("d", "v").createOrReplaceTempView("fill_dates")

  test("month axis uses true calendar arithmetic and TO is exclusive") {
    mkDateView()
    val rows = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2024-07-01') STEP INTERVAL 1 MONTH"""
        .stripMargin).collect()
    val ds = rows.map(_.getDate(0).toString)
    // six grid months (Feb/Mar/May/Jun filled — firsts of month, not
    // 30-day drift: Jan 1 + 30d would be Jan 31) + the off-grid Sep row
    assert(ds.toSeq == Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01",
      "2024-05-01", "2024-06-01", "2024-09-01"))
    val byD = rows.map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(byD("2024-02-01") == 0L && byD("2024-03-01") == 0L)
    assert(byD("2024-04-01") == 40L && byD("2024-09-01") == 90L)
    assert(!ds.contains("2024-07-01")) // TO exclusive
  }

  test("QUARTER step lowers to 3n months") {
    mkDateView()
    val ds = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2025-01-01') STEP INTERVAL 1 QUARTER"""
        .stripMargin).collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-01-01", "2024-04-01", "2024-07-01", "2024-09-01", "2024-10-01"))
  }

  test("bare integer STEP on a Date axis means days") {
    Seq((Date.valueOf("2024-01-01"), 1L)).toDF("d", "v").createOrReplaceTempView("fill_day")
    val ds = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_day GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2024-01-06') STEP 2""".stripMargin)
      .collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-01-01", "2024-01-03", "2024-01-05"))
  }

  test("DateTime axis: INTERVAL HOUR step and bare-integer seconds") {
    Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (Timestamp.valueOf("2024-01-01 03:00:00"), 3L),
    ).toDF("ts", "v").createOrReplaceTempView("fill_ts")
    val hours = spark.sql(
      """SELECT ts, sum(v) AS v FROM fill_ts GROUP BY ts
        |ORDER BY ts WITH FILL FROM toDateTime('2024-01-01 00:00:00') TO toDateTime('2024-01-01 04:00:00') STEP INTERVAL 1 HOUR"""
        .stripMargin).collect()
    assert(hours.map(_.getTimestamp(0).toString).toSeq == Seq(
      "2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0",
      "2024-01-01 02:00:00.0", "2024-01-01 03:00:00.0"))
    assert(hours.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L, 3L))
    val secs = spark.sql(
      """SELECT ts, sum(v) AS v FROM fill_ts GROUP BY ts
        |ORDER BY ts WITH FILL FROM toDateTime('2024-01-01 00:00:00') TO toDateTime('2024-01-01 00:00:04') STEP 2"""
        .stripMargin).collect().map(_.getTimestamp(0).toString)
    assert(secs.take(2).toSeq == Seq("2024-01-01 00:00:00.0", "2024-01-01 00:00:02.0"))
  }

  test("INTERPOLATE carry + affine compose with a date axis") {
    Seq(
      (Date.valueOf("2024-01-01"), 10L, 100L),
      (Date.valueOf("2024-04-01"), 40L, 400L),
    ).toDF("d", "cnt0", "peak0").createOrReplaceTempView("fill_interp")
    val rows = spark.sql(
      """SELECT d, sum(cnt0) AS cnt, max(peak0) AS peak FROM fill_interp GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2024-05-01')
        |  STEP INTERVAL 1 MONTH INTERPOLATE (cnt AS cnt, peak AS peak - 7)""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", 10L, 100L),
      ("2024-02-01", 10L, 93L),  // carry cnt; peak ramps −7/row from last source
      ("2024-03-01", 10L, 86L),
      ("2024-04-01", 40L, 400L)))
  }

  test("bound-less WITH FILL derives the axis from the data (max inclusive)") {
    mkDateView()
    // month steps: 2024-01 .. 2024-09 from the data's own min/max
    val months = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
        |ORDER BY d WITH FILL STEP INTERVAL 1 MONTH""".stripMargin)
      .collect().map(_.getDate(0).toString)
    assert(months.length == 9 && months.head == "2024-01-01" && months.last == "2024-09-01")
    // integers, no step: sequence()'s type default of 1
    Seq((1L, 10L), (4L, 40L)).toDF("n", "v").createOrReplaceTempView("fill_int_bl")
    val ns = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_int_bl GROUP BY n
        |ORDER BY n WITH FILL""".stripMargin).collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1L, 2L, 3L, 4L))
    // dates, no step: 1-day default
    Seq((Date.valueOf("2024-01-01"), 1L), (Date.valueOf("2024-01-04"), 4L))
      .toDF("d", "v").createOrReplaceTempView("fill_day_bl")
    val ds = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_day_bl GROUP BY d
        |ORDER BY d WITH FILL""".stripMargin).collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    // INTERPOLATE composes with the bound-less axis
    val interp = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_day_bl GROUP BY d
        |ORDER BY d WITH FILL INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(_.getLong(1))
    assert(interp.toSeq == Seq(1L, 1L, 1L, 4L))
  }

  test("half-bounded WITH FILL: FROM-only derives TO from the max, TO-only FROM from the min") {
    mkDateView()
    // FROM-only month axis: grid Mar..Sep (data max, inclusive); the
    // Jan source row is before FROM and survives off-grid
    val fromOnly = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-03-01') STEP INTERVAL 1 MONTH""".stripMargin)
      .collect().map(_.getDate(0).toString)
    assert(fromOnly.toSeq == Seq("2024-01-01", "2024-03-01", "2024-04-01", "2024-05-01",
      "2024-06-01", "2024-07-01", "2024-08-01", "2024-09-01"))
    // TO-only int axis: FROM = data min, TO stays exclusive
    Seq((3L, 30L), (5L, 50L)).toDF("n", "v").createOrReplaceTempView("fill_half_int")
    val toOnly = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_half_int GROUP BY n
        |ORDER BY n WITH FILL TO 8 STEP 2""".stripMargin).collect().map(_.getLong(0))
    assert(toOnly.toSeq == Seq(3L, 5L, 7L))
    // a FROM beyond the data max fills nothing — source rows pass through
    val beyond = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_half_int GROUP BY n
        |ORDER BY n WITH FILL FROM 100""".stripMargin).collect().map(_.getLong(0))
    assert(beyond.toSeq == Seq(3L, 5L))
    // a TO at/below the data min likewise
    val below = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_half_int GROUP BY n
        |ORDER BY n WITH FILL TO 3""".stripMargin).collect().map(_.getLong(0))
    assert(below.toSeq == Seq(3L, 5L))
    // INTERPOLATE composes with a half-bounded axis
    val interp = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_half_int GROUP BY n
        |ORDER BY n WITH FILL TO 7 INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(interp.toSeq == Seq((3L, 30L), (4L, 30L), (5L, 50L), (6L, 50L)))
  }

  test("grouped WITH FILL: fill restarts per preceding sort key") {
    Seq(
      ("a", 1L, 10L), ("a", 4L, 40L),
      ("b", 2L, 20L), ("b", 3L, 30L),
    ).toDF("cat", "n", "v").createOrReplaceTempView("fill_grp")
    // boundless: each group fills its OWN min..max
    val rows = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 40L),
      ("b", 2L, 20L), ("b", 3L, 30L)))
    // bounded: the same grid for every group, TO exclusive; the
    // off-grid source row (a, 4) survives
    val bounded = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL FROM 1 TO 4""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bounded.toSeq == Seq(
      ("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 40L),
      ("b", 1L, 0L), ("b", 2L, 20L), ("b", 3L, 30L)))
    // INTERPOLATE carries within the group only — b's first filled row
    // must not see a's last value
    val interp = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL FROM 1 TO 4 INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(interp.toSeq == Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 40L),
      ("b", 1L, 0L), ("b", 2L, 20L), ("b", 3L, 30L)))
    // a prefix key in INTERPOLATE refuses by pass-through
    intercept[Exception](spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL INTERPOLATE (cat AS cat)""".stripMargin).collect())
    // a NULL group still lines up with its own axis rows (null-safe join)
    Seq((Option.empty[String], 1L, 5L), (Option.empty[String], 3L, 15L))
      .toDF("cat", "n", "v").createOrReplaceTempView("fill_grp_null")
    val nulls = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp_null GROUP BY cat, n
        |ORDER BY cat, n WITH FILL""".stripMargin)
      .collect().map(r => (if (r.isNullAt(0)) "NULL" else r.getString(0), r.getLong(1), r.getLong(2)))
    assert(nulls.toSeq == Seq(("NULL", 1L, 5L), ("NULL", 2L, 0L), ("NULL", 3L, 15L)))
  }

  test("grouped boundless fill plans as aggregate + join — no nested loop") {
    Seq(("a", 1L, 10L), ("a", 4L, 40L), ("b", 2L, 20L)).toDF("cat", "n", "v")
      .createOrReplaceTempView("fill_grp_plan")
    val df = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_grp_plan GROUP BY cat, n
        |ORDER BY cat, n WITH FILL""".stripMargin)
    df.collect()
    // the per-group axis is ONE aggregate + ONE equi-join: at scale
    // (many categories × long series) a nested-loop here would be
    // O(groups × rows); only the bounded grouped form carries a
    // deliberate tiny CROSS JOIN (distinct prefix × literal grid)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"grouped boundless fill must not plan a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"grouped boundless fill must not plan a nested loop:\n$plan")
  }

  test("STALENESS bounds each source row's trailing run (CH 24.10 semantics)") {
    // the CH docs' own example shape: keys 0,5,10,15 with STALENESS 3
    // → each row (INCLUDING the last) fills 2 trailing steps
    Seq((0L, 1L), (5L, 1L), (10L, 1L), (15L, 1L)).toDF("n", "v")
      .createOrReplaceTempView("fill_stale")
    val ns = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_stale GROUP BY n
        |ORDER BY n WITH FILL STALENESS 3""".stripMargin).collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(0L, 1L, 2L, 5L, 6L, 7L, 10L, 11L, 12L, 15L, 16L, 17L))
    // a nearer next source row truncates the run (never bridges past it)
    Seq((0L, 1L), (2L, 2L)).toDF("n", "v").createOrReplaceTempView("fill_stale2")
    val near = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_stale2 GROUP BY n
        |ORDER BY n WITH FILL STALENESS 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(near.toSeq == Seq((0L, 1L), (1L, 0L), (2L, 2L), (3L, 0L), (4L, 0L), (5L, 0L), (6L, 0L)))
    // STEP composes: values v+s, v+2s, … while < v + k
    Seq((0L, 1L), (10L, 1L)).toDF("n", "v").createOrReplaceTempView("fill_stale3")
    val stepped = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_stale3 GROUP BY n
        |ORDER BY n WITH FILL STEP 2 STALENESS 5""".stripMargin).collect().map(_.getLong(0))
    assert(stepped.toSeq == Seq(0L, 2L, 4L, 10L, 12L, 14L))
  }

  test("STALENESS composes with the grouped prefix and INTERPOLATE") {
    Seq(("a", 0L, 10L), ("a", 8L, 80L), ("b", 1L, 11L)).toDF("cat", "n", "v")
      .createOrReplaceTempView("fill_stale_grp")
    // runs restart per category: a's rows each trail 2 fills (staleness
    // 3, gap 0→8 NOT bridged), b's lone row trails its own run
    val rows = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_stale_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL STALENESS 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("a", 0L, 10L), ("a", 1L, 0L), ("a", 2L, 0L),
      ("a", 8L, 80L), ("a", 9L, 0L), ("a", 10L, 0L),
      ("b", 1L, 11L), ("b", 2L, 0L), ("b", 3L, 0L)))
    // carry INTERPOLATE rides the filled runs
    val interp = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_stale_grp GROUP BY cat, n
        |ORDER BY cat, n WITH FILL STALENESS 3 INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(interp.toSeq == Seq(
      ("a", 0L, 10L), ("a", 1L, 10L), ("a", 2L, 10L),
      ("a", 8L, 80L), ("a", 9L, 80L), ("a", 10L, 80L),
      ("b", 1L, 11L), ("b", 2L, 11L), ("b", 3L, 11L)))
    // duplicate source values produce ONE run, not a joined fan-out
    Seq((0L, 1L), (0L, 2L), (4L, 4L)).toDF("n", "v").createOrReplaceTempView("fill_stale_dup")
    val dup = spark.sql(
      """SELECT n, v FROM fill_stale_dup
        |ORDER BY n WITH FILL STALENESS 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dup.count(_._1 == 1L) == 1 && dup.count(_._1 == 2L) == 1)
    assert(dup.count(_._1 == 0L) == 2) // both source rows survive
  }

  test("STALENESS fill plans as a union, never a join") {
    Seq((0L, 1L), (5L, 1L), (10L, 1L)).toDF("n", "v")
      .createOrReplaceTempView("fill_stale_plan")
    val df = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_stale_plan GROUP BY n
        |ORDER BY n WITH FILL STALENESS 3""".stripMargin)
    df.collect()
    // fill values cannot collide with source values, so the axis is a
    // UNION ALL — a FULL OUTER join here would shuffle both sides on
    // a key that never equates
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), s"staleness fill must plan a union:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"),
      s"staleness fill must not plan a join:\n$plan")
  }

  test("STALENESS refusal edges: FROM/TO combos, non-positive k, interval steps") {
    Seq((0L, 1L)).toDF("n", "v").createOrReplaceTempView("fill_stale_bad")
    def refuses(sql: String): Unit =
      intercept[Exception](spark.sql(sql).collect())
    // CH rejects STALENESS together with FROM; TO likewise here
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL FROM 0 STALENESS 3""".stripMargin)
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL TO 10 STALENESS 3""".stripMargin)
    // k must be positive
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL STALENESS 0""".stripMargin)
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL STALENESS -3""".stripMargin)
    // INTERVAL steps refuse at parse — CH's staleness unit is a number
    mkDateView()
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL STEP INTERVAL 1 MONTH STALENESS 3""".stripMargin)
    // STEP 0 refuses (CH rejects zero fill steps)
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL STEP 0 STALENESS 3""".stripMargin)
    // a Long-overflowing STALENESS literal refuses cleanly at parse
    refuses("""SELECT n, sum(v) AS v FROM fill_stale_bad GROUP BY n
              |ORDER BY n WITH FILL STALENESS 99999999999999999999""".stripMargin)
    // a date fill COLUMN (unknowable at parse) fails loudly at analysis
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL STALENESS 3""".stripMargin)
  }

  test("DESC fill: bounded, boundless, half-bounded run downward") {
    Seq((10L, 100L), (4L, 40L)).toDF("n", "v").createOrReplaceTempView("fill_desc")
    // bounded: grid 10,8,6,4,2 — TO 0 exclusive downward
    val bounded = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_desc GROUP BY n
        |ORDER BY n DESC WITH FILL FROM 10 TO 0 STEP -2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(bounded.toSeq == Seq((10L, 100L), (8L, 0L), (6L, 0L), (4L, 40L), (2L, 0L)))
    // boundless: data max down to min, default step -1
    val boundless = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_desc GROUP BY n
        |ORDER BY n DESC WITH FILL""".stripMargin).collect().map(_.getLong(0))
    assert(boundless.toSeq == Seq(10L, 9L, 8L, 7L, 6L, 5L, 4L))
    // FROM-only: FROM 6 down to the data min (inclusive); the source
    // row above FROM survives off-grid and sorts first
    val fromOnly = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_desc GROUP BY n
        |ORDER BY n DESC WITH FILL FROM 6""".stripMargin).collect().map(_.getLong(0))
    assert(fromOnly.toSeq == Seq(10L, 6L, 5L, 4L))
    // TO-only: data max down to TO exclusive
    val toOnly = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_desc GROUP BY n
        |ORDER BY n DESC WITH FILL TO 7""".stripMargin).collect().map(_.getLong(0))
    assert(toOnly.toSeq == Seq(10L, 9L, 8L, 4L))
    // INTERPOLATE carries along the OUTPUT (descending) order
    val interp = spark.sql(
      """SELECT n, sum(v) AS v FROM fill_desc GROUP BY n
        |ORDER BY n DESC WITH FILL FROM 10 TO 2 STEP -2 INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(interp.toSeq == Seq((10L, 100L), (8L, 100L), (6L, 100L), (4L, 40L)))
    // grouped DESC: each category fills its own max→min
    Seq(("a", 1L, 10L), ("a", 3L, 30L), ("b", 5L, 50L)).toDF("cat", "n", "v")
      .createOrReplaceTempView("fill_desc_grp")
    val grp = spark.sql(
      """SELECT cat, n, sum(v) AS v FROM fill_desc_grp GROUP BY cat, n
        |ORDER BY cat, n DESC WITH FILL""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(grp.toSeq == Seq(("a", 3L), ("a", 2L), ("a", 1L), ("b", 5L)))
  }

  test("empty or inverted literal ranges fill nothing — source rows pass through") {
    Seq((10L, 100L), (4L, 40L)).toDF("n", "v").createOrReplaceTempView("fill_empty")
    def keys(sql: String): Seq[Long] = spark.sql(sql).collect().map(_.getLong(0)).toSeq
    // ASC: FROM at or above TO → empty grid, never a sequence() crash
    assert(keys("""SELECT n, sum(v) AS v FROM fill_empty GROUP BY n
                  |ORDER BY n WITH FILL FROM 7 TO 7""".stripMargin) == Seq(4L, 10L))
    assert(keys("""SELECT n, sum(v) AS v FROM fill_empty GROUP BY n
                  |ORDER BY n WITH FILL FROM 9 TO 5""".stripMargin) == Seq(4L, 10L))
    // DESC: FROM at or below TO likewise
    assert(keys("""SELECT n, sum(v) AS v FROM fill_empty GROUP BY n
                  |ORDER BY n DESC WITH FILL FROM 7 TO 7""".stripMargin) == Seq(10L, 4L))
    assert(keys("""SELECT n, sum(v) AS v FROM fill_empty GROUP BY n
                  |ORDER BY n DESC WITH FILL FROM 0 TO 10 STEP -1""".stripMargin) == Seq(10L, 4L))
    // date axis: equal bounds likewise pass through empty
    mkDateView()
    val ds = spark.sql(
      """SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
        |ORDER BY d WITH FILL FROM toDate('2024-02-01') TO toDate('2024-02-01') STEP INTERVAL 1 MONTH"""
        .stripMargin).collect().map(_.getDate(0).toString)
    assert(ds.toSeq == Seq("2024-01-01", "2024-04-01", "2024-09-01"))
  }

  test("DESC fill refusals: sign mismatch, date axes, staleness, inverted bounds") {
    Seq((10L, 100L)).toDF("n", "v").createOrReplaceTempView("fill_desc_bad")
    def refuses(sql: String): Unit =
      intercept[Exception](spark.sql(sql).collect())
    // positive step with DESC (CH rejects the sign mismatch)
    refuses("""SELECT n, sum(v) AS v FROM fill_desc_bad GROUP BY n
              |ORDER BY n DESC WITH FILL FROM 10 TO 0 STEP 2""".stripMargin)
    // DESC date grid (negative INTERVAL spellings unsupported)
    mkDateView()
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d DESC WITH FILL FROM toDate('2024-09-01') TO toDate('2024-01-01') STEP INTERVAL 1 MONTH""".stripMargin)
    // STALENESS + DESC
    refuses("""SELECT n, sum(v) AS v FROM fill_desc_bad GROUP BY n
              |ORDER BY n DESC WITH FILL STALENESS 3""".stripMargin)
  }

  test("zero and overflowing steps refuse across the fill forms") {
    Seq((1L, 10L), (4L, 40L)).toDF("n", "v").createOrReplaceTempView("fill_step0")
    def refuses(sql: String): Unit =
      intercept[Exception](spark.sql(sql).collect())
    refuses("""SELECT n, sum(v) AS v FROM fill_step0 GROUP BY n
              |ORDER BY n WITH FILL FROM 1 TO 10 STEP 0""".stripMargin)
    refuses("""SELECT n, sum(v) AS v FROM fill_step0 GROUP BY n
              |ORDER BY n WITH FILL STEP 0""".stripMargin)
    mkDateView()
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL STEP INTERVAL 0 MONTH""".stripMargin)
    refuses("""SELECT n, sum(v) AS v FROM fill_step0 GROUP BY n
              |ORDER BY n WITH FILL FROM 1 TO 10 STEP 99999999999999999999""".stripMargin)
    // negative steps refuse in EVERY form — descending fill needs the
    // DESC sort-key spelling CH pairs it with, which passes through
    refuses("""SELECT n, sum(v) AS v FROM fill_step0 GROUP BY n
              |ORDER BY n WITH FILL FROM 10 TO 0 STEP -1""".stripMargin)
    refuses("""SELECT n, sum(v) AS v FROM fill_step0 GROUP BY n
              |ORDER BY n WITH FILL STEP -1""".stripMargin)
  }

  test("refusal edges pass through and fail loudly at parse") {
    mkDateView()
    def refuses(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null)
    }
    // mixed bound kinds: int FROM, date TO
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL FROM 0 TO toDate('2024-07-01') STEP INTERVAL 1 MONTH""".stripMargin)
    // unknown interval unit
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL FROM toDate('2024-01-01') TO toDate('2024-07-01') STEP INTERVAL 1 FORTNIGHT""".stripMargin)
    // malformed literal
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL FROM toDate('garbage') TO toDate('2024-07-01') STEP INTERVAL 1 MONTH""".stripMargin)
    // INTERVAL step on an integer axis
    refuses("""SELECT d, sum(v) AS v FROM fill_dates GROUP BY d
              |ORDER BY d WITH FILL FROM 0 TO 10 STEP INTERVAL 1 DAY""".stripMargin)
    // negative step in a half-bounded form (it would invert the
    // data-derived bound guard)
    Seq((3L, 30L)).toDF("n", "v").createOrReplaceTempView("fill_neg_half")
    refuses("""SELECT n, sum(v) AS v FROM fill_neg_half GROUP BY n
              |ORDER BY n WITH FILL FROM 10 STEP -1""".stripMargin)
  }
}
