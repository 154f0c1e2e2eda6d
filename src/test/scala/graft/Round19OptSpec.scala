package graft

import graft.operators.Mutate
import org.apache.spark.sql.functions._

/** Round-19 optimization pins: the mutation rewrite collapsed its
  * discovery to one stats pass and the streaming landings moved
  * driver-side — these tests pin the exact semantics the rewrite had
  * to replicate (NULL predicates, emptied-partition detection, the
  * observed INSERT count, landing byte-equivalence). */
class Round19OptSpec extends SparkSpec {
  import spark.implicits._

  private def tempPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r19opt_$tag").resolve("t").toString

  test("delete with a NULL predicate: NULL rows mark nothing affected, but drop inside affected partitions") {
    val path = tempPath("nullpred")
    // p=0: flag values TRUE and NULL  → affected; where(!pred) drops NULLs too
    // p=1: flag NULL only             → NOT affected (no TRUE row); stays on disk untouched
    // p=2: flag FALSE only            → untouched
    Seq[(java.lang.Long, Integer, java.lang.Boolean)](
      (1L, 0, true), (2L, 0, null), (3L, 0, false),
      (4L, 1, null), (5L, 1, null),
      (6L, 2, false))
      .toDF("id", "p", "flag")
      .write.partitionBy("p").parquet(path)
    val rep = Mutate.delete(spark, path, "p", $"flag")
    // only pred=TRUE rows count as changed; only p=0 is affected
    assert(rep.partitionsTotal == 3 && rep.partitionsRewritten == 1 && rep.rowsChanged == 1)
    assert(rep.partitionsEmptied == 0)
    val t = spark.read.parquet(path)
    // p=0 lost BOTH the TRUE row and the NULL row (where(!pred) semantics);
    // p=1's NULL rows survive because the partition was never affected
    assert(t.where($"p" === 0).select("id").as[Long].collect().toSeq == Seq(3L))
    assert(t.where($"p" === 1).count() == 2)
    assert(t.where($"p" === 2).count() == 1)
  }

  test("delete emptying a partition via TRUE+NULL rows reports and removes it") {
    val path = tempPath("emptied")
    Seq[(java.lang.Long, Integer, java.lang.Boolean)](
      (1L, 0, true), (2L, 0, null), // all of p=0 goes (TRUE marks it affected, NULL dropped by !pred)
      (3L, 1, false))
      .toDF("id", "p", "flag")
      .write.partitionBy("p").parquet(path)
    val rep = Mutate.delete(spark, path, "p", $"flag")
    assert(rep.partitionsRewritten == 1 && rep.rowsChanged == 1)
    assert(rep.partitionsEmptied == 1)
    assert(!new java.io.File(s"$path/p=0").exists())
    assert(spark.read.parquet(path).count() == 1)
  }

  test("update never reports emptied partitions") {
    val path = tempPath("updemp")
    Seq((1L, 0, 1.0), (2L, 1, 2.0)).toDF("id", "p", "v")
      .write.partitionBy("p").parquet(path)
    val rep = Mutate.update(spark, path, "p", $"p" === 0, Seq("v" -> lit(9.0)))
    assert(rep.partitionsRewritten == 1 && rep.partitionsEmptied == 0)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("Landing.jsonFiles matches the Spark JSON writer byte-for-byte; None lands an empty flush file") {
    val df = Seq((1L, "a", 2.5), (2L, "b", -0.5), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "s", "v")
    // reference bytes: the single-task Spark JSON sink
    val ref = java.nio.file.Files.createTempDirectory("graft_r19opt_ref").toString
    df.coalesce(1).write.mode("overwrite").json(ref)
    val part = new java.io.File(ref).listFiles().filter(_.getName.startsWith("part-")).head
    val expected = new String(java.nio.file.Files.readAllBytes(part.toPath), "UTF-8")
    val landing = tempPath("landing")
    graft.streaming.Landing.jsonFiles(landing, Seq(Some(df), None),
      spark.sparkContext.hadoopConfiguration)
    val got = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(landing, "00.json")), "UTF-8")
    assert(got == expected)
    val flush = java.nio.file.Paths.get(landing, "01.json").toFile
    assert(flush.exists() && flush.length() == 0)
    // mtimes pin the replay order
    assert(new java.io.File(landing, "00.json").lastModified <
      new java.io.File(landing, "01.json").lastModified)
  }

  test("INSERT surfaces report the observed row count from the write pass, including zero rows") {
    spark.sql("DROP TABLE IF EXISTS r19opt_ins")
    val whRoot = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    val wh = new org.apache.hadoop.fs.Path(whRoot, "r19opt_ins")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    spark.sql("CREATE TABLE r19opt_ins (id BIGINT, s STRING) USING parquet")
    val n1 = spark.sql("INSERT INTO r19opt_ins (id, s) FORMAT CSV\n1,x\n2,y")
      .head().getLong(0)
    assert(n1 == 2L)
    // zero-row ingest: a headers-only CSVWithNames INFILE must report 0
    // (the Observation must fire even when the write moves no rows)
    val empty = java.nio.file.Files.createTempDirectory("graft_r19opt_csv")
      .resolve("empty.csv")
    java.nio.file.Files.writeString(empty, "id,s\n")
    val n0 = spark.sql(
      s"INSERT INTO r19opt_ins FROM INFILE '$empty' FORMAT CSVWithNames")
      .head().getLong(0)
    assert(n0 == 0L)
    assert(spark.table("r19opt_ins").count() == 2)
    spark.sql("DROP TABLE r19opt_ins")
  }
}
