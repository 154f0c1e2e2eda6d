package graft.tools

import org.apache.spark.sql.SparkSession

/** Rehearsal main for the round-18 system.parts walk work: lands a
  * 1000-partition / ~10k-file MergeTree table (the shape a real table
  * has at scale — CH's system.parts promise is metadata-only reads,
  * but 10⁵-10⁶ files × serial footer opens used to stall the driver
  * for minutes) and times the COLD walk (parallel listStatus + footer
  * waves, empty cache), the WARM walk (all cache hits), and the
  * post-insert incremental walk (only new files re-read). Prints one
  * JSON line; numbers land in docs/AUDIT_parts_walk_r18.md.
  *
  * Run like Bench (same classpath and --add-opens set):
  *   java ... graft.tools.PartsWalkRehearsal
  */
object PartsWalkRehearsal {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-parts-rehearsal")
    import graft.plans.SystemViews
    spark.sql("DROP TABLE IF EXISTS pwr_t")
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh, "pwr_t"), true)

    val t0 = System.nanoTime()
    spark.sql("""CREATE TABLE pwr_t (id UInt64, p UInt32, v Float64)
                 ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    spark.range(0, 1000000)
      .selectExpr("id", "CAST(id % 1000 AS INT) AS p", "id * 1.5 AS v")
      .repartition(10)
      .createOrReplaceTempView("pwr_src")
    spark.sql("INSERT INTO pwr_t (id, p, v) SELECT id, p, v FROM pwr_src")
    val landSec = (System.nanoTime() - t0) / 1e9

    def walk(): (Double, Long, Long, Long) = {
      val r0 = SystemViews.footerReads.get()
      val w0 = System.nanoTime()
      val rows = spark.sql(
        "SELECT count(*) AS parts, sum(rows) AS rows, sum(part_count) AS files " +
          "FROM system.parts WHERE table = 'pwr_t'").head()
      val sec = (System.nanoTime() - w0) / 1e9
      (sec, rows.getLong(0), rows.getLong(2), SystemViews.footerReads.get() - r0)
    }

    val (coldSec, parts, files, coldReads) = walk()
    val (warmSec, _, _, warmReads) = walk()
    spark.sql("INSERT INTO pwr_t (id, p, v) VALUES (2000000, 7, 1.0)")
    val (incSec, _, _, incReads) = walk()

    println(s"""{"metric":"parts_walk_rehearsal","partitions":$parts,"files":$files,""" +
      s""""land_sec":${f"$landSec%.1f"},"cold_sec":${f"$coldSec%.2f"},"cold_footer_reads":$coldReads,""" +
      s""""warm_sec":${f"$warmSec%.2f"},"warm_footer_reads":$warmReads,""" +
      s""""incremental_sec":${f"$incSec%.2f"},"incremental_footer_reads":$incReads}""")
    spark.sql("DROP TABLE IF EXISTS pwr_t")
    spark.stop()
  }
}
