package graft

/** Round-16 advice items, verified in behavior (not just code):
  * (1) SHOW CREATE TABLE resolves at EXECUTION — a plan parsed before
  * a later ALTER answers the current state and parse bakes no DDL;
  * (2) the Join/Kafka CREATE gate reads the actual engine, so a
  * COMMENT payload mentioning 'ENGINE = Kafka' no longer skips
  * manifest persistence; (3) CREATE is atomic — a failing
  * sub-statement (bad TTL) leaves no partial table; (4) duplicate
  * clause keywords in the engine tail refuse loudly instead of
  * silently merging last-wins; (5) partitioned CTAS records the
  * SELECT's declared column order for SHOW CREATE. */
class Round16AdviceSpec extends SparkSpec {

  private def showCreate(t: String): String =
    spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)

  test("SHOW CREATE TABLE resolves at execution, not parse") {
    dropWithLocation("r16_live")
    spark.sql("""CREATE TABLE r16_live (a Int64, b String)
                 ENGINE = MergeTree ORDER BY a
                 SETTINGS index_granularity = 4096""")
    // parse only — no execution; the plan must carry NO baked DDL
    val plan = spark.sessionState.sqlParser.parsePlan("SHOW CREATE TABLE r16_live")
    val cmd = plan.asInstanceOf[graft.plans.ChShowCreateTableCommand]
    assert(cmd.ddl.isEmpty, "parse baked the DDL into the plan")
    val before = cmd.run(spark).head.getString(0)
    assert(before.contains("SETTINGS index_granularity = 4096"))
    // ALTER after parse — executing the SAME parsed plan sees it
    spark.sql("ALTER TABLE r16_live MODIFY SETTING index_granularity = 8192")
    val after = cmd.run(spark).head.getString(0)
    assert(after.contains("index_granularity = 8192"), s"stale DDL:\n$after")
    spark.sql("DROP TABLE r16_live")
  }

  test("COMMENT payload mentioning ENGINE = Kafka does not skip the manifest") {
    dropWithLocation("r16_comment")
    spark.sql("""CREATE TABLE r16_comment (a Int64, b String)
                 ENGINE = MergeTree ORDER BY a
                 COMMENT 'mirror of the queue declared with ENGINE = Kafka upstream'""")
    val ddl = showCreate("r16_comment")
    assert(ddl.contains("ENGINE = MergeTree"), s"manifest was skipped:\n$ddl")
    assert(ddl.contains("ENGINE = Kafka upstream")) // the comment survives verbatim
    spark.sql("DROP TABLE r16_comment")
    // a COLUMN comment naming another engine must not steer the
    // recorded engine either (it precedes the real ENGINE clause)
    dropWithLocation("r16_colcomment")
    spark.sql("""CREATE TABLE r16_colcomment (a Int64 COMMENT 'was ENGINE = Log in CH', b String)
                 ENGINE = MergeTree ORDER BY a""")
    assert(showCreate("r16_colcomment").contains("ENGINE = MergeTree"))
    spark.sql("DROP TABLE r16_colcomment")
  }

  test("CREATE is atomic: a failing TTL sub-statement leaves no partial table") {
    dropWithLocation("r16_atomic")
    val e = intercept[Exception](
      spark.sql("""CREATE TABLE r16_atomic (a Int64, d DateTime)
                   ENGINE = MergeTree ORDER BY a
                   TTL nosuch_col + INTERVAL 30 DAY"""))
    assert(e.getMessage != null)
    assert(!spark.catalog.tableExists("r16_atomic"), "partial table left behind")
    // and the location is clean: an immediate valid re-CREATE works
    spark.sql("""CREATE TABLE r16_atomic (a Int64, d DateTime)
                 ENGINE = MergeTree ORDER BY a
                 TTL d + INTERVAL 30 DAY""")
    assert(spark.catalog.tableExists("r16_atomic"))
    assert(showCreate("r16_atomic").contains("TTL d + INTERVAL 30 DAY"))
    spark.sql("DROP TABLE r16_atomic")
  }

  test("duplicate clause keywords in the engine tail refuse loudly") {
    dropWithLocation("r16_dup")
    val e1 = intercept[IllegalArgumentException](
      spark.sql("""CREATE TABLE r16_dup (a Int64)
                   ENGINE = MergeTree ORDER BY a
                   SETTINGS x = 1 SETTINGS y = 2"""))
    assert(e1.getMessage.contains("duplicate") && e1.getMessage.contains("SETTINGS"))
    val e2 = intercept[IllegalArgumentException](
      spark.sql("""CREATE TABLE r16_dup (a Int64, b Int64)
                   ENGINE = MergeTree ORDER BY a ORDER BY b"""))
    assert(e2.getMessage.contains("duplicate") && e2.getMessage.contains("ORDER BY"))
    assert(!spark.catalog.tableExists("r16_dup"))
    // a quoted payload spelling a keyword is NOT a duplicate
    spark.sql("""CREATE TABLE r16_dup (a Int64)
                 ENGINE = MergeTree ORDER BY a
                 SETTINGS x = 1 COMMENT 'SETTINGS live here'""")
    assert(showCreate("r16_dup").contains("SETTINGS x = 1"))
    spark.sql("DROP TABLE r16_dup")
  }

  test("partitioned CTAS records the SELECT's declared column order") {
    dropWithLocation("r16_ctas_src")
    dropWithLocation("r16_ctas")
    spark.sql("CREATE TABLE r16_ctas_src (a Int64, p String, b Float64) ENGINE = MergeTree ORDER BY a")
    spark.sql("INSERT INTO r16_ctas_src VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
    spark.sql("""CREATE TABLE r16_ctas ENGINE = MergeTree PARTITION BY p ORDER BY a
                 AS SELECT a, p, b FROM r16_ctas_src""")
    val ddl = showCreate("r16_ctas")
    val cols = Seq("`a`", "`p`", "`b`")
    val idxs = cols.map(ddl.indexOf)
    assert(idxs.forall(_ >= 0) && idxs == idxs.sorted,
      s"CTAS SHOW CREATE lost the declared a, p, b order:\n$ddl")
    // Spark's own catalog floats the partition column to the end —
    // the manifest is what restores the declared order
    assert(spark.table("r16_ctas").schema.fieldNames.toSeq == Seq("a", "b", "p"))
    spark.sql("DROP TABLE r16_ctas")
    spark.sql("DROP TABLE r16_ctas_src")
  }
}
