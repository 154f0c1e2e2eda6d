package graft

/** Round-15: `SHOW CREATE TABLE` reconstructs the ClickHouse DDL of a
  * migrated table — engine, partition key, ORDER BY (persisted by the
  * CREATE front-end in `_graft_engine.txt`), the LIVE TTL rule and
  * the declared projections — CH's one-row `statement` shape. Plain
  * Spark tables keep Spark's native SHOW CREATE TABLE. */
class ShowCreateTableSpec extends SparkSpec {

  private def showCreate(t: String): String =
    spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)


  test("MergeTree table with TTL + projections: full CH DDL reconstruction") {
    dropWithLocation("sct_t")
    spark.sql("""CREATE TABLE sct_t (d Date, k String, v Float64, n UInt64)
                 ENGINE = MergeTree
                 PARTITION BY k
                 ORDER BY (d, k)
                 SETTINGS index_granularity = 8192""")
    spark.sql("ALTER TABLE sct_t MODIFY TTL d + INTERVAL 90 DAY")
    spark.sql("ALTER TABLE sct_t ADD PROJECTION p_agg (SELECT k, count(), sum(v) GROUP BY k)")
    spark.sql("ALTER TABLE sct_t ADD PROJECTION p_srt (SELECT d, n ORDER BY n)")
    val ddl = showCreate("sct_t")
    val expected =
      """CREATE TABLE sct_t
        |(
        |    `d` Date,
        |    `k` String,
        |    `v` Float64,
        |    `n` Int64,
        |    PROJECTION p_agg (SELECT k, count(), sum(v) GROUP BY k),
        |    PROJECTION p_srt (SELECT `d`, `n` ORDER BY n)
        |)
        |ENGINE = MergeTree
        |PARTITION BY k
        |ORDER BY (d, k)
        |TTL d + INTERVAL 90 DAY
        |SETTINGS index_granularity = 8192""".stripMargin
    assert(ddl == expected, s"got:\n$ddl")
    // the statement column is named like CH's
    assert(spark.sql("SHOW CREATE TABLE sct_t").columns.toSeq == Seq("statement"))
    // TTL tracks the LIVE rule, not the creation text
    spark.sql("ALTER TABLE sct_t MODIFY TTL d + INTERVAL 30 DAY WHERE v < 0")
    assert(showCreate("sct_t").contains("TTL d + INTERVAL 30 DAY WHERE v < 0"))
    spark.sql("ALTER TABLE sct_t REMOVE TTL")
    assert(!showCreate("sct_t").contains("TTL"))
    // dropping a projection drops its line
    spark.sql("ALTER TABLE sct_t DROP PROJECTION p_agg")
    assert(!showCreate("sct_t").contains("p_agg"))
    spark.sql("DROP TABLE sct_t")
  }

  test("CREATE-declared TTL is live (not stripped) and survives a mutation swap") {
    dropWithLocation("sct_ttl")
    spark.sql("""CREATE TABLE sct_ttl (d DateTime, v Int64)
                 ENGINE = MergeTree ORDER BY d
                 TTL d + INTERVAL 1 DAY""")
    // the TTL landed in the live manifest: MATERIALIZE TTL finds it
    spark.sql("INSERT INTO sct_ttl VALUES (now() - INTERVAL 10 DAY, 1), (now() + INTERVAL 1 DAY, 2)")
    spark.sql("ALTER TABLE sct_ttl MATERIALIZE TTL")
    assert(spark.table("sct_ttl").count() == 1)
    // the engine record survives the mutate swap (directory rewrite)
    spark.sql("ALTER TABLE sct_ttl DELETE WHERE v = 99")
    val ddl = showCreate("sct_ttl")
    assert(ddl.contains("ORDER BY d") && ddl.contains("TTL d + INTERVAL 1 DAY"), ddl)
    spark.sql("DROP TABLE sct_ttl")
  }

  test("CTAS form records its clauses; plain Spark tables keep native output") {
    dropWithLocation("sct_ctas")
    spark.sql("""CREATE TABLE sct_ctas ENGINE = ReplacingMergeTree(v) ORDER BY k AS
                 SELECT id AS k, id * 2 AS v FROM range(10)""")
    val ddl = showCreate("sct_ctas")
    assert(ddl.contains("ENGINE = ReplacingMergeTree(v)") && ddl.contains("ORDER BY k"), ddl)
    assert(spark.table("sct_ctas").count() == 10)
    spark.sql("DROP TABLE sct_ctas")
    // a table created through PLAIN Spark DDL has no graft metadata:
    // Spark's native SHOW CREATE TABLE answers (createtab_stmt)
    dropWithLocation("sct_plain")
    spark.sql("CREATE TABLE sct_plain (a INT, b STRING) USING parquet")
    val native = spark.sql("SHOW CREATE TABLE sct_plain")
    assert(native.columns.toSeq == Seq("createtab_stmt"))
    assert(native.head().getString(0).contains("USING parquet"))
    spark.sql("DROP TABLE sct_plain")
  }

  test("SHOW CREATE DICTIONARY returns the recorded DDL; unknown/API dictionaries refuse") {
    val dir = s"/tmp/graft_sct_dict_${System.nanoTime()}"
    spark.range(5).selectExpr("id AS k", "concat('v', id) AS v")
      .write.mode("overwrite").parquet(dir)
    val ddl = s"""CREATE DICTIONARY sct_dict (k UInt64, v String) PRIMARY KEY k
                  SOURCE(FILE(PATH '$dir' FORMAT 'Parquet')) LAYOUT(FLAT())"""
    spark.sql(ddl)
    try {
      val shown = spark.sql("SHOW CREATE DICTIONARY sct_dict")
      assert(shown.columns.toSeq == Seq("statement"))
      assert(shown.head().getString(0) == ddl.trim)
      // DROP forgets the DDL; a later SHOW refuses loudly
      spark.sql("DROP DICTIONARY sct_dict")
      val e = intercept[Exception](spark.sql("SHOW CREATE DICTIONARY sct_dict"))
      assert(e.getMessage.contains("does not exist"))
      // a Scala-API registration has no DDL to show — guidance, not a blank
      graft.operators.Dictionaries.register("sct_api_dict", "k",
        () => spark.range(3).selectExpr("id AS k", "id AS v"))
      val e2 = intercept[Exception](spark.sql("SHOW CREATE DICTIONARY sct_api_dict"))
      assert(e2.getMessage.contains("Scala API"))
    } finally {
      graft.operators.Dictionaries.unregister("sct_api_dict")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("splitEngineTail: paren/quote-aware top-level clause split") {
    import graft.plans.ChSqlParser.splitEngineTail
    val m = splitEngineTail(
      "PARTITION BY toYYYYMM(d) ORDER BY (a, cityHash64(b), c) SAMPLE BY cityHash64(b) " +
        "TTL d + INTERVAL 1 DAY SETTINGS index_granularity = 8192, ttl_only_drop_parts = 1")
    assert(m("PARTITION BY") == "toYYYYMM(d)")
    assert(m("ORDER BY") == "(a, cityHash64(b), c)")
    assert(m("SAMPLE BY") == "cityHash64(b)")
    assert(m("TTL") == "d + INTERVAL 1 DAY")
    assert(m("SETTINGS") == "index_granularity = 8192, ttl_only_drop_parts = 1")
    // keywords inside parens or strings do not split
    val m2 = splitEngineTail("ORDER BY (a, concat('TTL ', b)) TTL d")
    assert(m2("ORDER BY") == "(a, concat('TTL ', b))" && m2("TTL") == "d")
  }
}
