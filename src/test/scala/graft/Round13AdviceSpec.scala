package graft

import org.apache.spark.sql.functions._

/** Round 13: the four round-12 ADVICE findings, pinned in code. */
class Round13AdviceSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](expr: String): T =
    spark.sql(s"SELECT $expr AS v").collect().head.getAs[T]("v")

  test("generateSnowflakeID: unique past 4096 rows per partition (overflow advances the ms field)") {
    val n = 20000
    val ids = spark.range(n).coalesce(1) // ONE partition: the failure shape
      .selectExpr("generateSnowflakeID() AS id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length == n, "ids must be unique within a partition past the 4096 sequence bound")
    // sequence field still cycles 0..4095; machine field constant per partition
    assert(ids.map(_ & 4095L).distinct.length == 4096)
    assert(ids.map(id => (id >> 12) & 1023L).distinct.length == 1)
    // the overflow lands in the timestamp field: 20000 rows span
    // ceil(20000/4096) = 5 simulated milliseconds
    assert(ids.map(_ >>> 22).distinct.length == 5)
  }

  test("generateSnowflakeID: distinct across partitions via the machine field") {
    val ids = spark.range(10000).repartition(4)
      .selectExpr("generateSnowflakeID() AS id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
  }

  test("multiplyDecimal / divideDecimal truncate (CH semantics), never round") {
    // the two ADVICE counterexamples, verbatim
    assert(one[java.math.BigDecimal](
      "divideDecimal(CAST(2 AS DECIMAL(10,0)), CAST(3 AS DECIMAL(10,0)), 1)")
      .compareTo(new java.math.BigDecimal("0.6")) == 0)
    assert(one[java.math.BigDecimal](
      "divideDecimal(CAST(1 AS DECIMAL(10,0)), CAST(3 AS DECIMAL(10,0)), 10)")
      .compareTo(new java.math.BigDecimal("0.3333333333")) == 0)
    // truncation is toward zero for negatives (digit discard, not floor)
    assert(one[java.math.BigDecimal](
      "divideDecimal(CAST(-12 AS DECIMAL(10,0)), CAST(2.1 AS DECIMAL(10,1)), 1)")
      .compareTo(new java.math.BigDecimal("-5.7")) == 0)
    assert(one[java.math.BigDecimal](
      "multiplyDecimal(CAST(0.99 AS DECIMAL(10,2)), CAST(0.99 AS DECIMAL(10,2)), 2)")
      .compareTo(new java.math.BigDecimal("0.98")) == 0) // exact 0.9801 truncates, HALF_UP said 0.98 too; pin a rounding-sensitive one below
    assert(one[java.math.BigDecimal](
      "multiplyDecimal(CAST(0.5 AS DECIMAL(10,1)), CAST(0.15 AS DECIMAL(10,2)), 2)")
      .compareTo(new java.math.BigDecimal("0.07")) == 0) // exact 0.075: HALF_UP would say 0.08
    // default result scale: max of the input scales
    assert(one[java.math.BigDecimal](
      "divideDecimal(CAST(1 AS DECIMAL(10,1)), CAST(3 AS DECIMAL(10,3)))")
      .compareTo(new java.math.BigDecimal("0.333")) == 0)
    // division by zero fails loudly, like CH and the oracle
    val e = intercept[Exception](
      spark.sql("SELECT divideDecimal(CAST(1 AS DECIMAL(10,0)), CAST(0 AS DECIMAL(10,0)), 2)").collect())
    assert(e.getMessage.contains("division by zero") ||
      (e.getCause != null && e.getCause.getMessage.contains("division by zero")))
  }

  test("decimal refusal edges: overflow to NULL, toDecimal256 past 38 digits loud, OrZero fills") {
    // toDecimal32 holds 9 digits: 1e10 at scale 2 overflows -> NULL (TRY-style cast)
    assert(spark.sql("SELECT toDecimal32OrNull('10000000000', 2) AS v").head().isNullAt(0))
    // the 256-width name exists but the engine's 38-digit bound is loud, not silent
    val e = intercept[Exception](spark.sql("SELECT toDecimal256(1.5, 40) AS v").collect())
    assert(e.getMessage.contains("38") || (e.getCause != null && e.getCause.getMessage.contains("38")))
    // in-range 256 works at the mapped precision
    assert(one[java.math.BigDecimal]("toDecimal256(1.5, 6)")
      .compareTo(new java.math.BigDecimal("1.500000")) == 0)
    assert(one[java.math.BigDecimal]("toDecimal128OrZero('nope', 4)")
      .compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(one[java.math.BigDecimal]("toDecimal128OrNull('2.25', 4)")
      .compareTo(new java.math.BigDecimal("2.2500")) == 0)
  }

  test("broadcast threshold policy: heap/16 clamped to [64 MB, 512 MB]; env override wins") {
    // this JVM has no SPARK_GRAFT_BROADCAST_MB set, so the policy applies
    assume(sys.env.get("SPARK_GRAFT_BROADCAST_MB").isEmpty)
    val expected = math.min(math.max(Runtime.getRuntime.maxMemory() / 16, 64L << 20), 512L << 20)
    assert(GraftSession.broadcastBytes == expected)
    assert(GraftSession.broadcastBytes >= (64L << 20))
    assert(GraftSession.broadcastBytes <= (512L << 20))
  }

  test("ASOF SQL rewrite: alias that suffixes another identifier doesn't misorient sides") {
    // alias "c" is a suffix of "abc": raw substring matching saw
    // "c." inside "abc.ts" and misclassified the operand's side
    spark.sql("CREATE OR REPLACE TEMP VIEW asof_probe_13 AS " +
      "SELECT * FROM VALUES (1, 10L), (1, 20L) AS t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW asof_quote_13 AS " +
      "SELECT * FROM VALUES (1, 5L, 'a'), (1, 15L, 'b'), (1, 25L, 'z') AS t(k, ts, tag)")
    val got = spark.sql(
      """SELECT abc.ts AS pts, c.tag AS tag
        |FROM asof_probe_13 abc ASOF JOIN asof_quote_13 c
        |ON abc.k = c.k AND abc.ts >= c.ts
        |ORDER BY pts""".stripMargin).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((10L, "a"), (20L, "b")))
  }
}
