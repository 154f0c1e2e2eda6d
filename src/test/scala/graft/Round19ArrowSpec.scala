package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{ArrowIpc, Formats}

/** Round 19: FORMAT Arrow / ArrowStream ([[graft.sources.ArrowIpc]])
  * and INTO OUTFILE COMPRESSION levels — the last client-format
  * family the round-18 verdict listed as missing. Pins the IPC round
  * trips over the full supported type surface (nulls everywhere),
  * the partitioned write layout, the nested-type refusal, the
  * OUTFILE → INFILE symmetric paths, and the codec/level contracts.
  */
class Round19ArrowSpec extends SparkSpec {

  private val base = "/tmp/graft_arrow_spec"

  private val fullSchema = StructType(Seq(
    StructField("b", BooleanType), StructField("i8", ByteType),
    StructField("i16", ShortType), StructField("i32", IntegerType),
    StructField("i64", LongType), StructField("f32", FloatType),
    StructField("f64", DoubleType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("d", DateType),
    StructField("ts", TimestampType), StructField("dec", DecimalType(20, 4))))

  private def fullRows: Seq[Row] = Seq(
    Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, "héllo", Array[Byte](1, 2, 3),
        Date.valueOf("2024-02-29"), Timestamp.valueOf("2024-02-29 12:34:56.789"),
        new java.math.BigDecimal("12345.6789")),
    Row(false, (-1).toByte, (-2).toShort, -3, -4L, -1.5f, -2.5, "", Array.empty[Byte],
        Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.0"),
        new java.math.BigDecimal("-0.0001")),
    Row(null, null, null, null, null, null, null, null, null, null, null, null))

  private def fullDf = spark.createDataFrame(
    spark.sparkContext.parallelize(fullRows, 2), fullSchema)

  private def show(r: Row): String = r.toSeq.map {
    case b: Array[Byte] => b.mkString("[", ",", "]")
    case x => String.valueOf(x)
  }.mkString("|")

  test("Arrow file-format round trip: every supported type, nulls included") {
    val p = s"$base/full_arrow"
    Formats.write(fullDf, p, "Arrow")
    val back = Formats.read(spark, p, "Arrow")
    assert(back.schema == StructType(fullSchema.map(f => f.copy(nullable = true))))
    assert(back.collect().map(show).sorted.toSeq ==
      fullDf.collect().map(show).sorted.toSeq)
  }

  test("ArrowStream round trip matches too") {
    val p = s"$base/full_arrows"
    Formats.write(fullDf, p, "ArrowStream")
    val back = Formats.read(spark, p, "ArrowStream")
    assert(back.collect().map(show).sorted.toSeq ==
      fullDf.collect().map(show).sorted.toSeq)
  }

  test("multi-partition, multi-batch write: one part file per non-empty partition") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4)
    val p = s"$base/big"
    Formats.write(df, p, "Arrow")
    val files = new java.io.File(p).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
    val back = Formats.read(spark, p, "Arrow")
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) ==
      (1 to 10000).map(_.toLong).sum)
  }

  test("empty result still lands a schema-carrying file that reads back empty") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v").where("id < 0")
    val p = s"$base/empty"
    Formats.write(df, p, "Arrow")
    val back = Formats.read(spark, p, "Arrow")
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(back.count() == 0)
  }

  test("nested types refuse at plan time with guidance, before any task runs") {
    import spark.implicits._
    val df = Seq((1, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[UnsupportedOperationException](
      Formats.write(df, s"$base/nested", "Arrow"))
    assert(e.getMessage.contains("xs") && e.getMessage.contains("Parquet"), e.getMessage)
  }

  test("INTO OUTFILE FORMAT Arrow lands ONE file; INFILE imports it (extension inference too)") {
    dropWithLocation("arrow_src"); dropWithLocation("arrow_dst")
    spark.sql("CREATE TABLE arrow_src (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("CREATE TABLE arrow_dst (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO arrow_src VALUES (1, 'A', 10.5), (2, 'B', 20.25), (3, 'A', 30.125)")
    spark.sql(s"SELECT id, prio, total FROM arrow_src INTO OUTFILE '$base/rt.arrow' FORMAT Arrow")
    assert(new java.io.File(s"$base/rt.arrow").isFile)
    // FORMAT omitted: .arrow infers
    val n = spark.sql(s"INSERT INTO arrow_dst FROM INFILE '$base/rt.arrow'").head().getLong(0)
    assert(n == 3L)
    val got = spark.sql("SELECT sum(total) FROM arrow_dst").head().getDouble(0)
    assert(math.abs(got - 60.875) < 1e-9)
    spark.sql("DROP TABLE arrow_src"); spark.sql("DROP TABLE arrow_dst")
  }

  test("OUTFILE COMPRESSION gzip LEVEL 9 → INFILE COMPRESSION gzip round trip") {
    dropWithLocation("gz_src"); dropWithLocation("gz_dst")
    spark.sql("CREATE TABLE gz_src (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("CREATE TABLE gz_dst (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO gz_src VALUES (1, 'A', 10.5), (2, 'B', 20.25)")
    spark.sql(s"SELECT id, prio, total FROM gz_src INTO OUTFILE '$base/rt.csv.gz' " +
      "COMPRESSION 'gzip' LEVEL 9 FORMAT CSVWithNames")
    // really gzip: magic bytes 1f 8b
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$base/rt.csv.gz")).take(2)
    assert(head(0) == 0x1f.toByte && head(1) == 0x8b.toByte)
    val n = spark.sql(s"INSERT INTO gz_dst FROM INFILE '$base/rt.csv.gz' " +
      "COMPRESSION 'gzip' FORMAT CSVWithNames").head().getLong(0)
    assert(n == 2L)
    assert(spark.sql("SELECT sum(total) FROM gz_dst").head().getDouble(0) == 30.75)
    spark.sql("DROP TABLE gz_src"); spark.sql("DROP TABLE gz_dst")
  }

  test("zstd and lz4 round trips; auto rides the native reader for .gz") {
    dropWithLocation("z_src"); dropWithLocation("z_dst")
    spark.sql("CREATE TABLE z_src (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("CREATE TABLE z_dst (id UInt64, prio String, total Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO z_src VALUES (1, 'A', 1.0), (2, 'B', 2.0), (3, 'C', 3.0)")
    spark.sql(s"SELECT id, prio, total FROM z_src INTO OUTFILE '$base/rt.json.zst' " +
      "COMPRESSION 'zstd' LEVEL 19 FORMAT JSONEachRow")
    spark.sql(s"INSERT INTO z_dst FROM INFILE '$base/rt.json.zst' COMPRESSION 'zstd' FORMAT JSONEachRow")
    spark.sql(s"SELECT id, prio, total FROM z_src INTO OUTFILE '$base/rt.tsv.lz4' " +
      "COMPRESSION 'lz4' FORMAT TSV")
    spark.sql(s"INSERT INTO z_dst FROM INFILE '$base/rt.tsv.lz4' COMPRESSION 'lz4' FORMAT TSV")
    // auto: Spark's csv reader decompresses .gz by extension on its own
    spark.sql(s"SELECT id, prio, total FROM z_src INTO OUTFILE '$base/rt2.csv.gz' " +
      "COMPRESSION 'gzip' FORMAT CSV")
    spark.sql(s"INSERT INTO z_dst FROM INFILE '$base/rt2.csv.gz' COMPRESSION 'auto' FORMAT CSV")
    assert(spark.sql("SELECT count(*) FROM z_dst").head().getLong(0) == 9L)
    assert(spark.sql("SELECT sum(total) FROM z_dst").head().getDouble(0) == 18.0)
    spark.sql("DROP TABLE z_src"); spark.sql("DROP TABLE z_dst")
  }

  test("compression refusal contracts: binary formats, orphan LEVEL, lz4 LEVEL, unknown codec") {
    val e1 = intercept[UnsupportedOperationException](
      spark.sql(s"SELECT 1 AS x INTO OUTFILE '$base/x.parquet' COMPRESSION 'gzip' FORMAT Parquet"))
    assert(e1.getMessage.contains("internally compressed"))
    // LEVEL without COMPRESSION is not a statement shape — fails loudly at parse
    val e2 = intercept[Exception](
      spark.sql(s"SELECT 1 AS x INTO OUTFILE '$base/x.csv' LEVEL 3 FORMAT CSV").collect())
    assert(e2.getMessage != null)
    val e3 = intercept[UnsupportedOperationException](
      spark.sql(s"SELECT 1 AS x INTO OUTFILE '$base/x.csv.lz4' COMPRESSION 'lz4' LEVEL 5 FORMAT CSV"))
    assert(e3.getMessage.contains("lz4"))
    val e4 = intercept[UnsupportedOperationException](
      spark.sql(s"SELECT 1 AS x INTO OUTFILE '$base/x.csv.br' COMPRESSION 'br' FORMAT CSV"))
    assert(e4.getMessage.contains("gzip, deflate, zstd, lz4"))
    val e5 = intercept[IllegalArgumentException](
      spark.sql(s"SELECT 1 AS x INTO OUTFILE '$base/x.csv.gz' COMPRESSION 'gzip' LEVEL 99 FORMAT CSV"))
    assert(e5.getMessage.contains("1-9"))
  }

  test("inline INSERT ... FORMAT Arrow refuses toward FROM INFILE (binary rows)") {
    dropWithLocation("arr_inline")
    spark.sql("CREATE TABLE arr_inline (id UInt64) ENGINE = MergeTree ORDER BY id")
    val e = intercept[UnsupportedOperationException](
      spark.sql("INSERT INTO arr_inline FORMAT Arrow\n123"))
    assert(e.getMessage.contains("FROM INFILE"), e.getMessage)
    spark.sql("DROP TABLE arr_inline")
  }

  test("direct ArrowIpc reader handles a single file path (not just directories)") {
    val p = s"$base/single"
    Formats.write(fullDf.coalesce(1), p, "Arrow")
    val part = new java.io.File(p).listFiles().filter(_.getName.startsWith("part-")).head
    val back = ArrowIpc.readDir(spark, part.getAbsolutePath, stream = false)
    assert(back.count() == 3)
  }
}
