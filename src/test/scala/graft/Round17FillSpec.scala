package graft

/** Round 17 closes the last WITH FILL descope (multi-key), extends
  * INTERPOLATE past the affine subset, puts STALENESS on calendar
  * axes, and fixes the fill default from a literal 0 to the TYPE
  * default (graft_fill_default → Literal.default: 0 / '' / epoch —
  * CH's own fill values).
  */
class Round17FillSpec extends SparkSpec {
  import spark.implicits._

  private def refuses(sql: String): Unit = {
    val e = intercept[Exception](spark.sql(sql).collect())
    assert(e.getMessage != null)
  }

  // ------------------------------------------------- multi-key fill

  test("multi-key fill: the ClickHouse docs d1/d2 example, verbatim semantics") {
    // SELECT toDate((number*10)*86400) d1, toDate(number*86400) d2, 'original' source
    // FROM numbers(10) WHERE number % 3 = 1 ORDER BY d2 WITH FILL, d1 WITH FILL STEP 5
    // (CH's bare `STEP 5` means 5 days on a Date axis; the axis kind
    // is unknowable at parse here, so the INTERVAL spelling carries
    // the same semantics — the bare-int-on-date form fails loudly at
    // analysis per the boundless machinery's documented contract)
    val rows = spark.sql(
      """SELECT toDate(toDateTime((number * 10) * 86400)) AS d1,
        |       toDate(toDateTime(number * 86400)) AS d2,
        |       'original' AS source
        |FROM numbers(10) WHERE number % 3 = 1
        |ORDER BY d2 WITH FILL, d1 WITH FILL STEP INTERVAL 5 DAY""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getString(2)))
    // CH's published output: d2 fills 01-02…01-08 daily; filled rows
    // take the TYPE defaults (epoch date for d1, '' for source); d1
    // itself never fills — no repeated d2 values.
    assert(rows.toSeq == Seq(
      ("1970-01-11", "1970-01-02", "original"),
      ("1970-01-01", "1970-01-03", ""),
      ("1970-01-01", "1970-01-04", ""),
      ("1970-02-10", "1970-01-05", "original"),
      ("1970-01-01", "1970-01-06", ""),
      ("1970-01-01", "1970-01-07", ""),
      ("1970-03-12", "1970-01-08", "original")))
  }

  test("multi-key fill: second key fills within repeated first-key runs") {
    Seq((1, 1, 10.0), (1, 4, 40.0), (3, 2, 20.0), (3, 3, 30.0))
      .toDF("a", "b", "v").createOrReplaceTempView("mkf_rep")
    val rows = spark.sql(
      "SELECT a, b, v FROM mkf_rep ORDER BY a WITH FILL, b WITH FILL")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1, 1, 10.0), (1, 2, 0.0), (1, 3, 0.0), (1, 4, 40.0),
      (2, 0, 0.0), // a-fill: b takes the type default, CH's docs shape
      (3, 2, 20.0), (3, 3, 30.0)))
  }

  test("multi-key fill: INTERPOLATE applies at both stages (previous OUTPUT row)") {
    Seq((1, 1, 10.0), (1, 4, 40.0), (3, 2, 20.0), (3, 3, 30.0))
      .toDF("a", "b", "v").createOrReplaceTempView("mkf_interp")
    val rows = spark.sql(
      "SELECT a, b, v FROM mkf_interp ORDER BY a WITH FILL, b WITH FILL INTERPOLATE (v)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1, 1, 10.0), (1, 2, 10.0), (1, 3, 10.0), (1, 4, 40.0),
      (2, 0, 40.0), // the a-inserted row carries from the previous output row
      (3, 2, 20.0), (3, 3, 30.0)))
  }

  test("multi-key fill: literal bounds on the second key grid per group") {
    Seq((1, 2, 5.0), (1, 3, 6.0), (4, 2, 7.0)).toDF("a", "b", "v")
      .createOrReplaceTempView("mkf_bounds")
    val rows = spark.sql(
      "SELECT a, b, v FROM mkf_bounds ORDER BY a WITH FILL, b WITH FILL FROM 1 TO 4")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // each source group of a grids b over [1,4); a-inserted rows (2,3)
    // stay single rows with the b default — CH's nested, NOT cartesian
    assert(rows.toSeq == Seq(
      (1, 1, 0.0), (1, 2, 5.0), (1, 3, 6.0),
      (2, 0, 0.0), (3, 0, 0.0),
      (4, 1, 0.0), (4, 2, 7.0), (4, 3, 0.0)))
  }

  test("THREE fill keys compose: each fills within runs of equal earlier keys") {
    // (a, b, c): a has a gap (1→3); within a=1, b has a gap (1→3);
    // within (a=1, b=1), c has a gap (1→3)
    Seq((1, 1, 1, 10.0), (1, 1, 3, 30.0), (1, 3, 1, 50.0), (3, 1, 1, 70.0))
      .toDF("a", "b", "c", "v").createOrReplaceTempView("mkf_three")
    val rows = spark.sql(
      "SELECT a, b, c, v FROM mkf_three ORDER BY a WITH FILL, b WITH FILL, c WITH FILL")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1, 1, 1, 10.0), (1, 1, 2, 0.0), (1, 1, 3, 30.0), // c fills within (1,1)
      (1, 2, 0, 0.0),                                   // b fill: c defaults
      (1, 3, 1, 50.0),
      (2, 0, 0, 0.0),                                   // a fill: b and c default
      (3, 1, 1, 70.0)))
  }

  test("multi-key fill refusals: duplicate key, DESC, STALENESS, expression key") {
    Seq((1, 2, 3, 1.0)).toDF("a", "b", "c", "v").createOrReplaceTempView("mkf_bad")
    refuses("SELECT a, b, v FROM mkf_bad ORDER BY a WITH FILL, a WITH FILL")
    refuses("SELECT a, b, v FROM mkf_bad ORDER BY a DESC WITH FILL, b WITH FILL")
    refuses("SELECT a, b, v FROM mkf_bad ORDER BY a WITH FILL, b WITH FILL STALENESS 3")
    refuses("SELECT a, b, v FROM mkf_bad ORDER BY a + 1 WITH FILL, b WITH FILL")
  }

  // ------------------------------------- non-affine INTERPOLATE forms

  test("INTERPOLATE geometric and cross-column recurrences") {
    Seq((1, 100.0, 5.0), (5, 200.0, 7.0)).toDF("t", "c", "w")
      .createOrReplaceTempView("nafe_t")
    val rows = spark.sql(
      """SELECT t, c, w FROM nafe_t
        |ORDER BY t WITH FILL INTERPOLATE (c AS c * 2, w AS w + t)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    // c doubles off the last source; w_i = w_{i-1} + t_{i-1}
    assert(rows.toSeq == Seq(
      (1, 100.0, 5.0), (2, 200.0, 6.0), (3, 400.0, 8.0), (4, 800.0, 11.0),
      (5, 200.0, 7.0)))
    val div = spark.sql(
      """SELECT t, c, w FROM nafe_t
        |ORDER BY t WITH FILL INTERPOLATE (c AS c / 2)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(div.toSeq == Seq((1, 100.0), (2, 50.0), (3, 25.0), (4, 12.5), (5, 200.0)))
    val minus = spark.sql(
      """SELECT t, c, w FROM nafe_t
        |ORDER BY t WITH FILL INTERPOLATE (w AS w - t)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(2)))
    // w_2 = 5-1 = 4, w_3 = 4-2 = 2, w_4 = 2-3 = -1
    assert(minus.toSeq == Seq((1, 5.0), (2, 4.0), (3, 2.0), (4, -1.0), (5, 7.0)))
  }

  test("non-affine INTERPOLATE composes with the grouped prefix") {
    Seq(("g1", 1, 8.0), ("g1", 4, 16.0), ("g2", 2, 3.0), ("g2", 4, 9.0))
      .toDF("g", "t", "c").createOrReplaceTempView("nafe_grp")
    val rows = spark.sql(
      """SELECT g, t, c FROM nafe_grp
        |ORDER BY g, t WITH FILL INTERPOLATE (c AS c * 2)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("g1", 1, 8.0), ("g1", 2, 16.0), ("g1", 3, 32.0), ("g1", 4, 16.0),
      ("g2", 2, 3.0), ("g2", 3, 6.0), ("g2", 4, 9.0)))
  }

  test("non-affine refusals: wrong base, column mult, interpolated operand, /0") {
    Seq((1, 2.0, 3.0)).toDF("t", "c", "w").createOrReplaceTempView("nafe_bad")
    // AS-expression must recur on the column itself
    refuses("SELECT t, c, w FROM nafe_bad ORDER BY t WITH FILL INTERPOLATE (c AS w + 1)")
    // cross-column multiplication is not a closed-form whitelist member
    refuses("SELECT t, c, w FROM nafe_bad ORDER BY t WITH FILL INTERPOLATE (c AS c * w)")
    // operand itself interpolated → evaluation-order coupling
    refuses("SELECT t, c, w FROM nafe_bad ORDER BY t WITH FILL INTERPOLATE (c AS c + w, w AS w)")
    // division by zero
    refuses("SELECT t, c, w FROM nafe_bad ORDER BY t WITH FILL INTERPOLATE (c AS c / 0)")
    // operand not in the select list
    refuses("SELECT t, c FROM nafe_bad ORDER BY t WITH FILL INTERPOLATE (c AS c + nope)")
  }

  // ------------------------------------------- STALENESS on date axes

  test("STALENESS INTERVAL on a Date axis: bounded runs, holes stay") {
    Seq(("2024-01-02", 1.0), ("2024-01-03", 2.0), ("2024-01-10", 3.0), ("2024-01-12", 4.0))
      .toDF("ds", "v").selectExpr("CAST(ds AS DATE) AS d", "v")
      .createOrReplaceTempView("stale_dates")
    val rows = spark.sql(
      """SELECT d, v FROM stale_dates
        |ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1)))
    assert(rows.toSeq == Seq(
      ("2024-01-02", 1.0),            // next source is 01-03: no run
      ("2024-01-03", 2.0), ("2024-01-04", 0.0), ("2024-01-05", 0.0),
      // 01-06..01-09 is a HOLE (gap exceeds staleness) — not bridged
      ("2024-01-10", 3.0), ("2024-01-11", 0.0),
      ("2024-01-12", 4.0), ("2024-01-13", 0.0), ("2024-01-14", 0.0)))
  }

  test("STALENESS INTERVAL on a DateTime axis with hour steps + INTERPOLATE") {
    Seq(("2024-01-01 00:00:00", 10.0), ("2024-01-01 06:00:00", 20.0))
      .toDF("tss", "v").selectExpr("CAST(tss AS TIMESTAMP) AS ts", "v")
      .createOrReplaceTempView("stale_ts")
    val rows = spark.sql(
      """SELECT ts, v FROM stale_ts
        |ORDER BY ts WITH FILL STEP INTERVAL 1 HOUR STALENESS INTERVAL 3 HOUR
        |INTERPOLATE (v AS v)""".stripMargin)
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1)))
    assert(rows.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 10.0), ("2024-01-01 01:00:00.0", 10.0),
      ("2024-01-01 02:00:00.0", 10.0),
      // 03:00-05:00 hole: staleness 3h ends the run
      ("2024-01-01 06:00:00.0", 20.0), ("2024-01-01 07:00:00.0", 20.0),
      ("2024-01-01 08:00:00.0", 20.0)))
  }

  test("STALENESS INTERVAL composes with the grouped prefix") {
    Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-05", 2.0), ("b", "2024-01-02", 3.0))
      .toDF("g", "ds", "v").selectExpr("g", "CAST(ds AS DATE) AS d", "v")
      .createOrReplaceTempView("stale_grp")
    val rows = spark.sql(
      """SELECT g, d, v FROM stale_grp
        |ORDER BY g, d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 2 DAY""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 0.0),
      ("a", "2024-01-05", 2.0), ("a", "2024-01-06", 0.0),
      ("b", "2024-01-02", 3.0), ("b", "2024-01-03", 0.0)))
  }

  test("STALENESS INTERVAL refusals: bare-int step, FROM/TO, DESC, zero interval") {
    Seq(("2024-01-01", 1.0)).toDF("ds", "v").selectExpr("CAST(ds AS DATE) AS d", "v")
      .createOrReplaceTempView("stale_bad")
    // an INTERVAL staleness demands an INTERVAL step (bare-int units are axis-dependent)
    refuses("SELECT d, v FROM stale_bad ORDER BY d WITH FILL STEP 1 STALENESS INTERVAL 3 DAY")
    refuses("SELECT d, v FROM stale_bad ORDER BY d WITH FILL STALENESS INTERVAL 3 DAY")
    refuses("SELECT d, v FROM stale_bad ORDER BY d WITH FILL FROM toDate('2024-01-01') STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY")
    refuses("SELECT d, v FROM stale_bad ORDER BY d DESC WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY")
    refuses("SELECT d, v FROM stale_bad ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 0 DAY")
  }

  // ----------------------------------------------- type-default fills

  test("string passenger columns fill with '' (the round-16 literal 0 was a cast crash)") {
    Seq((1, "x", 10.0), (4, "y", 40.0)).toDF("t", "tag", "v")
      .createOrReplaceTempView("fill_str")
    val rows = spark.sql("SELECT t, tag, v FROM fill_str ORDER BY t WITH FILL")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1, "x", 10.0), (2, "", 0.0), (3, "", 0.0), (4, "y", 40.0)))
  }

  test("date passenger columns fill with the epoch default") {
    Seq((1, "2024-03-01"), (3, "2024-03-05")).toDF("t", "ds")
      .selectExpr("t", "CAST(ds AS DATE) AS d").createOrReplaceTempView("fill_datecol")
    val rows = spark.sql("SELECT t, d FROM fill_datecol ORDER BY t WITH FILL")
      .collect().map(r => (r.getInt(0), r.getDate(1).toString))
    assert(rows.toSeq == Seq((1, "2024-03-01"), (2, "1970-01-01"), (3, "2024-03-05")))
  }

  test("string INTERPOLATE carry works (coalesce default is now type-correct)") {
    Seq((1, "x"), (4, "y")).toDF("t", "tag").createOrReplaceTempView("fill_strc")
    val rows = spark.sql(
      "SELECT t, tag FROM fill_strc ORDER BY t WITH FILL INTERPOLATE (tag)")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "x"), (2, "x"), (3, "x"), (4, "y")))
  }
}
