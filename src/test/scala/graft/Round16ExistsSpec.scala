package graft

/** Round 16: `EXISTS [TABLE] t` / `EXISTS DICTIONARY d` / `EXISTS
  * DATABASE db` — CH's existence probe, one `result` row of 1/0
  * (UInt8 result as TINYINT, the CHECK TABLE shape). Execution-time
  * resolution: the same parsed statement answers differently after a
  * CREATE or DROP. */
class Round16ExistsSpec extends SparkSpec {
  import spark.implicits._

  test("EXISTS TABLE answers 1/0 and covers temp views") {
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("exists_probe")
    assert(spark.sql("EXISTS TABLE exists_probe").collect().map(_.getByte(0)).toSeq == Seq(1.toByte))
    // CH's bare shorthand
    assert(spark.sql("EXISTS exists_probe").head().getByte(0) == 1.toByte)
    assert(spark.sql("EXISTS TABLE no_such_table_xyz").head().getByte(0) == 0.toByte)
    // output column is CH's `result`
    assert(spark.sql("EXISTS exists_probe").columns.toSeq == Seq("result"))
  }

  test("the same statement text answers the truth at each execution") {
    assert(spark.sql("EXISTS TABLE exists_flip").head().getByte(0) == 0.toByte)
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("exists_flip")
    assert(spark.sql("EXISTS TABLE exists_flip").head().getByte(0) == 1.toByte)
    spark.catalog.dropTempView("exists_flip")
    assert(spark.sql("EXISTS TABLE exists_flip").head().getByte(0) == 0.toByte)
  }

  test("EXISTS DICTIONARY and EXISTS DATABASE") {
    assert(spark.sql("EXISTS DICTIONARY no_such_dict_xyz").head().getByte(0) == 0.toByte)
    assert(spark.sql("EXISTS DATABASE default").head().getByte(0) == 1.toByte)
    assert(spark.sql("EXISTS DATABASE no_such_db_xyz").head().getByte(0) == 0.toByte)
    // the TEMPORARY form sees ONLY temporary tables (CH semantics):
    // a temp view answers 1, a permanent table answers 0
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("exists_tmp")
    assert(spark.sql("EXISTS TEMPORARY TABLE exists_tmp").head().getByte(0) == 1.toByte)
    spark.sql("DROP TABLE IF EXISTS exists_perm")
    spark.sql("CREATE TABLE exists_perm AS SELECT 1 AS x")
    try {
      assert(spark.sql("EXISTS TABLE exists_perm").head().getByte(0) == 1.toByte)
      assert(spark.sql("EXISTS TEMPORARY TABLE exists_perm").head().getByte(0) == 0.toByte)
    } finally spark.sql("DROP TABLE IF EXISTS exists_perm")
  }

  test("names the catalog API rejects answer 0, never throw") {
    assert(spark.sql("EXISTS TABLE nosuchcat.nodb.not_there").head().getByte(0) == 0.toByte)
  }

  test("EXISTS (SELECT ...) subqueries are untouched by the intercept") {
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("exists_sub")
    val n = spark.sql(
      "SELECT count(*) AS c FROM exists_sub WHERE EXISTS (SELECT 1)").head().getLong(0)
    assert(n == 1L)
  }
}
