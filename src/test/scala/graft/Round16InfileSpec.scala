package graft

/** Round 16: the INSERT-ingestion surface — `INSERT INTO t FROM
  * INFILE 'path' [FORMAT f]` and the client-script `INSERT INTO t
  * FORMAT f⏎rows` inline spelling. Pins the OUTFILE → INFILE round
  * trip, column-list defaults, extension inference, the COMPRESSION
  * and format refusal contracts, and the inline text-format path. */
class Round16InfileSpec extends SparkSpec {

  private val base = "/tmp/graft_infile_spec"

  private def freshTable(name: String): Unit = {
    dropWithLocation(name)
    spark.sql(s"""CREATE TABLE $name (id UInt64, prio String, total Float64)
                  ENGINE = MergeTree ORDER BY id""")
  }

  test("OUTFILE → INFILE round trip: equal aggregates") {
    dropWithLocation("inf_src"); freshTable("inf_dst")
    spark.sql("CREATE TABLE inf_src (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO inf_src VALUES (1, 'A', 10.5), (2, 'B', 20.25), (3, 'A', 30.125)")
    spark.sql(s"SELECT id, prio, total FROM inf_src INTO OUTFILE '$base/rt.csv' FORMAT CSVWithNames")
    val n = spark.sql(s"INSERT INTO inf_dst FROM INFILE '$base/rt.csv' FORMAT CSVWithNames")
      .head().getLong(0)
    assert(n == 3L)
    val got = spark.sql("SELECT prio, count(*) c, sum(total) t FROM inf_dst GROUP BY prio ORDER BY prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("A", 2L, 40.625), ("B", 1L, 20.25)))
    spark.sql("DROP TABLE inf_src"); spark.sql("DROP TABLE inf_dst")
  }

  test("column-list INFILE fills unlisted columns with CH type defaults") {
    freshTable("inf_cols")
    spark.sql(s"SELECT 7 AS id, 42.5 AS total INTO OUTFILE '$base/cols.csv' FORMAT CSVWithNames")
    spark.sql(s"INSERT INTO inf_cols (id, total) FROM INFILE '$base/cols.csv' FORMAT CSVWithNames")
    val r = spark.sql("SELECT id, prio, total FROM inf_cols").head()
    assert(r.getLong(0) == 7L && r.getString(1) == "" && r.getDouble(2) == 42.5)
    spark.sql("DROP TABLE inf_cols")
  }

  test("FORMAT omitted infers from the extension; unknown extension refuses") {
    freshTable("inf_ext")
    // .csv → headerless CSV (CH's inference picks the family, not WithNames)
    spark.sql(s"SELECT 1 AS id, 'Z' AS prio, 5.0 AS total INTO OUTFILE '$base/ext.csv' FORMAT CSV")
    spark.sql(s"INSERT INTO inf_ext FROM INFILE '$base/ext.csv'")
    assert(spark.table("inf_ext").count() == 1L)
    val e = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO inf_ext FROM INFILE '$base/ext.dat'"))
    assert(e.getMessage.contains("cannot infer a format"))
    spark.sql("DROP TABLE inf_ext")
  }

  test("COMPRESSION none/auto pass; codecs off the classpath refuse") {
    freshTable("inf_comp")
    spark.sql(s"SELECT 1 AS id, 'Z' AS prio, 5.0 AS total INTO OUTFILE '$base/comp.csv' FORMAT CSV")
    spark.sql(s"INSERT INTO inf_comp FROM INFILE '$base/comp.csv' COMPRESSION 'none' FORMAT CSV")
    assert(spark.table("inf_comp").count() == 1L)
    // round 19: gzip/deflate/zstd/lz4 now EXECUTE (Round19ArrowSpec
    // pins the round trips); br has no codec here and still refuses
    val e = intercept[UnsupportedOperationException](
      spark.sql(s"INSERT INTO inf_comp FROM INFILE '$base/comp.csv' COMPRESSION 'br' FORMAT CSV"))
    assert(e.getMessage.contains("COMPRESSION"))
    spark.sql("DROP TABLE inf_comp")
  }

  test("unsupported FORMAT refuses with the supported list") {
    freshTable("inf_badfmt")
    val e = intercept[UnsupportedOperationException](
      spark.sql(s"INSERT INTO inf_badfmt FROM INFILE '$base/x.csv' FORMAT Avro"))
    assert(e.getMessage.contains("supported here are"))
    spark.sql("DROP TABLE inf_badfmt")
  }

  test("inline FORMAT CSV / TSV / JSONEachRow payloads execute distributed") {
    freshTable("inf_inline")
    val n1 = spark.sql("INSERT INTO inf_inline FORMAT CSV\n1,A,1.5\n2,B,2.5").head().getLong(0)
    assert(n1 == 2L)
    val n2 = spark.sql("INSERT INTO inf_inline FORMAT TSV\n3\tC\t3.5").head().getLong(0)
    assert(n2 == 1L)
    val n3 = spark.sql(
      """INSERT INTO inf_inline FORMAT JSONEachRow
        |{"id": 4, "prio": "D", "total": 4.5}
        |{"id": 5, "prio": "E", "total": 5.5}""".stripMargin).head().getLong(0)
    assert(n3 == 2L)
    val rows = spark.sql("SELECT id, prio, total FROM inf_inline ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "A", 1.5), (2L, "B", 2.5), (3L, "C", 3.5),
      (4L, "D", 4.5), (5L, "E", 5.5)))
    // column-list inline: unlisted column takes the CH default
    val n4 = spark.sql("INSERT INTO inf_inline (id, total) FORMAT CSV\n6,6.5").head().getLong(0)
    assert(n4 == 1L)
    val r6 = spark.sql("SELECT prio, total FROM inf_inline WHERE id = 6").head()
    assert(r6.getString(0) == "" && r6.getDouble(1) == 6.5)
    spark.sql("DROP TABLE inf_inline")
  }

  test("inline binary formats and missing payloads refuse toward FROM INFILE") {
    freshTable("inf_refuse")
    val e1 = intercept[UnsupportedOperationException](
      spark.sql("INSERT INTO inf_refuse FORMAT Parquet\nxxxx"))
    assert(e1.getMessage.contains("FROM INFILE"))
    val e2 = intercept[UnsupportedOperationException](
      spark.sql("INSERT INTO inf_refuse FORMAT CSV"))
    assert(e2.getMessage.contains("out-of-band") && e2.getMessage.contains("FROM INFILE"))
    spark.sql("DROP TABLE inf_refuse")
  }

  test("*WithNames maps by header NAME, not position (review)") {
    freshTable("inf_byname")
    // header column order differs from the table's — by-name mapping
    // must land each value in its named column (positional mapping
    // would put total into id)
    spark.sql(s"SELECT 9.75 AS total, 11 AS id, 'C' AS prio INTO OUTFILE '$base/byname.csv' FORMAT CSVWithNames")
    spark.sql(s"INSERT INTO inf_byname FROM INFILE '$base/byname.csv' FORMAT CSVWithNames")
    val r = spark.sql("SELECT id, prio, total FROM inf_byname").head()
    assert(r.getLong(0) == 11L && r.getString(1) == "C" && r.getDouble(2) == 9.75)
    // a header missing a target column refuses, naming it
    spark.sql(s"SELECT 1 AS id INTO OUTFILE '$base/missing.csv' FORMAT CSVWithNames")
    val e = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO inf_byname FROM INFILE '$base/missing.csv' FORMAT CSVWithNames"))
    assert(e.getMessage.contains("header") && e.getMessage.contains("prio"))
    spark.sql("DROP TABLE inf_byname")
  }

  test("malformed rows refuse instead of landing NULLs (review)") {
    freshTable("inf_strict")
    // inline: a non-numeric value in a Float64 column refuses (FAILFAST),
    // and nothing lands
    intercept[Exception](spark.sql("INSERT INTO inf_strict FORMAT CSV\n1,A,notanumber"))
    assert(spark.table("inf_strict").count() == 0L)
    // by-name file path: a bad value in a typed header column refuses
    // with the column named (a post-hoc cast would silently NULL it)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base-bad.csv"), "total,id,prio\nxx,1,A\n")
    val e = intercept[IllegalArgumentException](
      spark.sql(s"INSERT INTO inf_strict FROM INFILE '$base-bad.csv' FORMAT CSVWithNames"))
    assert(e.getMessage.contains("total"))
    assert(spark.table("inf_strict").count() == 0L)
    spark.sql("DROP TABLE inf_strict")
  }

  test("a quoted newline inside an inline CSV field stays one row (review)") {
    freshTable("inf_nl")
    val n = spark.sql("INSERT INTO inf_nl FORMAT CSV\n1,\"line1\nline2\",2.5\n2,plain,3.5")
      .head().getLong(0)
    assert(n == 2L)
    val rows = spark.sql("SELECT id, prio, total FROM inf_nl ORDER BY id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "line1\nline2" &&
      rows(0).getDouble(2) == 2.5)
    assert(rows(1).getString(1) == "plain")
    spark.sql("DROP TABLE inf_nl")
  }

  test("OUTFILE ORC round trips through INFILE (one shared format map)") {
    dropWithLocation("inf_orc_src"); freshTable("inf_orc_dst")
    spark.sql("CREATE TABLE inf_orc_src (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO inf_orc_src VALUES (1, 'A', 1.5), (2, 'B', 2.5)")
    spark.sql(s"SELECT id, prio, total FROM inf_orc_src INTO OUTFILE '$base/rt.orc' FORMAT ORC")
    val n = spark.sql(s"INSERT INTO inf_orc_dst FROM INFILE '$base/rt.orc' FORMAT ORC")
      .head().getLong(0)
    assert(n == 2L)
    assert(spark.sql("SELECT sum(total) FROM inf_orc_dst").head().getDouble(0) == 4.0)
    spark.sql("DROP TABLE inf_orc_src"); spark.sql("DROP TABLE inf_orc_dst")
  }

  test("INSERT INTO t SELECT … is untouched by the intercepts") {
    freshTable("inf_sel")
    spark.sql("INSERT INTO inf_sel SELECT 9, 'S', 9.5")
    assert(spark.table("inf_sel").count() == 1L)
    spark.sql("DROP TABLE inf_sel")
  }
}
