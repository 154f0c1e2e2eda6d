package graft

/** Round 16: CH-style `DESCRIBE TABLE` for engine-recorded tables —
  * CH type names, default kinds (empty, as CH prints for columns
  * without defaults) and partition/sorting-key membership flags;
  * plain Spark tables fall through to the native DESCRIBE. */
class Round16DescribeSpec extends SparkSpec {

  test("DESCRIBE TABLE on the q29t fixture shape: CH types + key flags") {
    dropWithLocation("desc_t")
    spark.sql("""CREATE TABLE desc_t (d Date, k String, v Float64, n UInt64)
                 ENGINE = MergeTree
                 PARTITION BY k
                 ORDER BY (d, k)
                 SETTINGS index_granularity = 8192""")
    val df = spark.sql("DESCRIBE TABLE desc_t")
    assert(df.columns.toSeq == Seq("name", "type", "default_type", "default_expression",
      "comment", "is_in_partition_key", "is_in_sorting_key"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(5), r.getInt(6)))
    // declared order restored (Spark floats partition col k to the end)
    assert(rows.toSeq == Seq(
      ("d", "Date", 0, 1),
      ("k", "String", 1, 1),
      ("v", "Float64", 0, 0),
      ("n", "Int64", 0, 0)))
    // DESC TABLE is the same statement
    assert(spark.sql("DESC TABLE desc_t").collect().length == 4)
    // resolution is at execution: an ADD COLUMN after parse shows up
    spark.sql("ALTER TABLE desc_t ADD COLUMN extra Int32")
    val after = spark.sql("DESCRIBE TABLE desc_t").collect().map(_.getString(0))
    assert(after.toSeq == Seq("d", "k", "v", "n", "extra"))
    spark.sql("DROP TABLE desc_t")
  }

  test("plain Spark tables keep the native DESCRIBE output") {
    dropWithLocation("desc_plain")
    spark.sql("CREATE TABLE desc_plain (a BIGINT, b STRING) USING parquet")
    val df = spark.sql("DESCRIBE TABLE desc_plain")
    assert(df.columns.toSeq == Seq("col_name", "data_type", "comment"))
    spark.sql("DROP TABLE desc_plain")
  }
}
