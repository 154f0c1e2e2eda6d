package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized model check for [[ChAlterColumnCommand]]: apply a random
  * sequence of ADD/DROP/RENAME/MODIFY COLUMN statements to a real
  * partitioned catalog table AND to an in-memory DataFrame model, and
  * assert the table equals the model after every step — schema names,
  * types, row content, partition layout. Catches order bugs, catalog
  * drift, and default-backfill mistakes the example-based spec can't
  * enumerate. */
class AlterColumnFuzzSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(wh, name), true)
  }

  private def assertSame(table: String, model: DataFrame): Unit = {
    val t = spark.table(table)
    // same column names & spark types (order-insensitive on partition
    // placement: the catalog lists partition columns last)
    assert(t.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap ==
      model.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap,
      s"schema drift: ${t.schema.simpleString} vs ${model.schema.simpleString}")
    val cols = model.schema.fieldNames.sorted.toSeq
    val got = t.select(cols.map(col): _*).orderBy(col("id")).collect().toSeq
    val want = model.select(cols.map(col): _*).orderBy(col("id")).collect().toSeq
    assert(got == want, s"content drift after ops")
  }

  test("random ADD/DROP/RENAME/MODIFY sequences match the DataFrame model") {
    val rnd = new scala.util.Random(2026L)
    freshTable("fuzz_col")
    spark.sql("""CREATE TABLE fuzz_col (id UInt64, v Float64, p String)
                 ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    spark.range(12).selectExpr("id", "CAST(id AS DOUBLE) / 4 AS v",
      "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END AS p")
      .createOrReplaceTempView("fuzz_src")
    spark.sql("INSERT INTO fuzz_col SELECT id, v, p FROM fuzz_src")
    var model = spark.sql("SELECT id, v, p FROM fuzz_src")

    var colIdx = 0
    for (_ <- 1 to 14) {
      val mutable = model.schema.fieldNames.filterNot(c => c == "p" || c == "id").toSeq
      rnd.nextInt(4) match {
        case 0 => // ADD with a literal default (typed), sometimes Nullable
          colIdx += 1
          val name = s"c$colIdx"
          if (rnd.nextBoolean()) {
            spark.sql(s"ALTER TABLE fuzz_col ADD COLUMN $name Int64 DEFAULT ${colIdx * 10}")
            model = model.withColumn(name, lit(colIdx * 10L))
          } else {
            spark.sql(s"ALTER TABLE fuzz_col ADD COLUMN $name Nullable(String)")
            model = model.withColumn(name, lit(null).cast("string"))
          }
        case 1 if mutable.nonEmpty => // DROP
          val victim = mutable(rnd.nextInt(mutable.size))
          spark.sql(s"ALTER TABLE fuzz_col DROP COLUMN $victim")
          model = model.drop(victim)
        case 2 if mutable.nonEmpty => // RENAME
          colIdx += 1
          val from = mutable(rnd.nextInt(mutable.size))
          val to = s"r$colIdx"
          spark.sql(s"ALTER TABLE fuzz_col RENAME COLUMN $from TO $to")
          model = model.withColumnRenamed(from, to)
        case 3 if mutable.nonEmpty => // MODIFY to String (always castable)
          val victim = mutable(rnd.nextInt(mutable.size))
          spark.sql(s"ALTER TABLE fuzz_col MODIFY COLUMN $victim String")
          model = model.withColumn(victim, col(victim).cast("string"))
        case _ => // nothing mutable yet — skip the round
      }
      assertSame("fuzz_col", model)
    }
    spark.sql("DROP TABLE IF EXISTS fuzz_col")
  }
}
