package graft

import org.apache.spark.sql.functions._

/** Round 18 ADVICE fixes:
  *  - STALENESS fill rows give passenger columns the TYPE default
  *    (graft_fill_default) instead of a literal 0 — the same fix the
  *    joined WITH FILL branch got in round 17; previously a string
  *    passenger came back '0' via UNION coercion and a date passenger
  *    failed UNION analysis outright.
  *  - Multi-key WITH FILL stages order their carry/recurrence windows
  *    by (own key, inner fill keys): ties on the outer key are one
  *    row per inner value, so a window ordered by the outer key alone
  *    read a partition-order-dependent "previous row".
  *  - SHOW TABLES IN system.sub raises Spark's NoSuchNamespaceException,
  *    not a raw IllegalArgumentException.
  *  - rrfFuse ENFORCES its bounded-leg contract instead of trusting it.
  */
class Round18AdviceSpec extends SparkSpec {
  import spark.implicits._

  test("integer STALENESS: string passenger fills '' (was '0' via union coercion)") {
    Seq((1, 10.0, "x"), (5, 50.0, "y"))
      .toDF("t", "v", "tag").createOrReplaceTempView("st_str")
    val rows = spark.sql(
      "SELECT t, v, tag FROM st_str ORDER BY t WITH FILL STALENESS 3")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1, 10.0, "x"), (2, 0.0, ""), (3, 0.0, ""),
      (5, 50.0, "y"), (6, 0.0, ""), (7, 0.0, "")))
  }

  test("INTERVAL STALENESS: date passenger fills epoch (was an analysis failure)") {
    Seq(("2024-01-01", "2024-03-15", 1.0), ("2024-06-01", "2024-08-20", 2.0))
      .toDF("ds", "due_s", "v")
      .selectExpr("CAST(ds AS DATE) AS d", "CAST(due_s AS DATE) AS due", "v")
      .createOrReplaceTempView("st_date")
    val rows = spark.sql(
      """SELECT d, due, v FROM st_date
        |ORDER BY d WITH FILL STEP INTERVAL 1 MONTH STALENESS INTERVAL 3 MONTH""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("2024-01-01", "2024-03-15", 1.0),
      ("2024-02-01", "1970-01-01", 0.0),
      ("2024-03-01", "1970-01-01", 0.0),
      ("2024-06-01", "2024-08-20", 2.0),
      ("2024-07-01", "1970-01-01", 0.0),
      ("2024-08-01", "1970-01-01", 0.0)))
  }

  test("STALENESS + INTERPOLATE: interpolated column carries, passenger still type-defaults") {
    Seq((1, 10.0, "x"), (5, 50.0, "y"))
      .toDF("t", "v", "tag").createOrReplaceTempView("st_interp")
    val rows = spark.sql(
      "SELECT t, v, tag FROM st_interp ORDER BY t WITH FILL STALENESS 3 INTERPOLATE (v)")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1, 10.0, "x"), (2, 10.0, ""), (3, 10.0, ""),
      (5, 50.0, "y"), (6, 50.0, ""), (7, 50.0, "")))
  }

  test("multi-key fill carry is deterministic: the recurrence base is the inner-key-max row") {
    // a=1 holds TWO rows (b=1 v=10, b=2 v=99); the a=2 insertion must
    // carry v from the previous OUTPUT row — (1, 2, 99), the inner-max
    // — not whichever of the two a=1 rows the partitioning ordered
    // last. Repartition wide so a nondeterministic window would have
    // shuffled candidates to pick from.
    Seq((1, 1, 10.0), (1, 2, 99.0), (3, 1, 30.0))
      .toDF("a", "b", "v").repartition(7).createOrReplaceTempView("mkf_det")
    val rows = spark.sql(
      "SELECT a, b, v FROM mkf_det ORDER BY a WITH FILL, b WITH FILL INTERPOLATE (v)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (1, 1, 10.0), (1, 2, 99.0),
      (2, 0, 99.0), // carries from (1,2,99), the (a,b)-max previous output row
      (3, 1, 30.0)))
  }

  test("multi-key fill: affine recurrence at the outer stage bases off the inner-max row") {
    Seq((1, 1, 10.0), (1, 2, 80.0), (4, 1, 30.0))
      .toDF("a", "b", "v").repartition(5).createOrReplaceTempView("mkf_aff")
    val rows = spark.sql(
      "SELECT a, b, v FROM mkf_aff ORDER BY a WITH FILL, b WITH FILL INTERPOLATE (v AS v + 1)")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    // a=2 and a=3 insertions ramp 80 → 81 → 82 off the (1,2) row
    assert(rows.toSeq == Seq(
      (1, 1, 10.0), (1, 2, 80.0),
      (2, 0, 81.0), (3, 0, 82.0),
      (4, 1, 30.0)))
  }

  test("SHOW TABLES IN system.sub raises NoSuchNamespaceException") {
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SHOW TABLES IN system.sub").collect())
    assert(e.isInstanceOf[org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException] ||
      e.getMessage.toLowerCase.contains("namespace"), e.getMessage)
  }

  test("rrfFuse refuses a leg above maxLegRows with pre-limit guidance") {
    val big = spark.range(0, 500).select($"id", rand(7).as("score"))
    // the cap lives IN the plan (one pass per leg — an eager count
    // executed every leg twice), so the refusal fires at execution
    val fused = graft.operators.TextAnalysis.rrfFuse(
      Seq((big, "id", "score")), maxLegRows = 100)
    val e = intercept[Exception](fused.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pre-limit")), msgs(e).mkString(" | "))
  }

  test("rrfFuse under the cap fuses as before") {
    val a = Seq((1L, 0.9), (2L, 0.8)).toDF("id", "score")
    val b = Seq((2L, 0.7), (3L, 0.6)).toDF("id", "score")
    val out = graft.operators.TextAnalysis.rrfFuse(
      Seq((a, "id", "score"), (b, "id", "score")), maxLegRows = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // id 2 appears in both legs
    assert(out.head == ((2L, 2L)))
  }
}
