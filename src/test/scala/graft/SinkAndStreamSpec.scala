package graft

import graft.operators.Skew
import graft.sources.MergeTreeWrite
import graft.streaming.WindowedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class SinkAndStreamSpec extends SparkSpec {
  import spark.implicits._

  test("MergeTreeWrite lays out partition dirs with rows sorted inside files") {
    val base = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(base.getTime + d.toLong * 86400000)
    val df = Seq(
      (3L, ts(0), "a"), (1L, ts(1), "b"), (2L, ts(40), "c"), (4L, ts(41), "d"),
    ).toDF("id", "ts", "payload")
    val out = Files.createTempDirectory("mtw").toString
    MergeTreeWrite.write(df, out,
      partitionExprs = Seq("month" -> date_format(col("ts"), "yyyy-MM")),
      orderBy = Seq("id"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("month=2026-01", "month=2026-02"))
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    // partition pruning: a month filter must prune to one partition dir
    val pruned = back.where(col("month") === "2026-01")
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("month=2026-02"))
  }

  test("MergeTreeWrite.writeBucketed gives a zero-Exchange co-located join") {
    val left = (1L to 200L).map(i => (i, s"o_$i")).toDF("k", "ov")
    val right = (1L to 600L).map(i => (i % 200 + 1, s"l_$i")).toDF("k", "lv")
    val base = Files.createTempDirectory("bkt").toString
    MergeTreeWrite.writeBucketed(left, "bkt_left_spec", s"$base/left", "k", 4, Seq("k"))
    MergeTreeWrite.writeBucketed(right, "bkt_right_spec", s"$base/right", "k", 4, Seq("k"))
    val joined = spark.table("bkt_left_spec").hint("merge")
      .join(spark.table("bkt_right_spec"), "k")
    assert(joined.count() == 600)
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket i zips with bucket i — no shuffle on either side
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("SelectedBucketsCount: 4 out of 4"))
  }

  test("WindowedAgg.tumbling aggregates event-time windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agged = WindowedAgg.tumbling(
      input.toDF().toDF("ts", "k", "v"),
      tsCol = "ts", watermarkDelay = "10 minutes", windowDur = "1 hour",
      keys = Seq("k"), aggs = Seq(count(lit(1)).as("cnt"), round(sum("v"), 2).as("total")))
    val q = agged.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update).start()
    try {
      val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      def ts(min: Int) = new java.sql.Timestamp(base.getTime + min.toLong * 60000)
      input.addData((ts(5), "a", 1.0), (ts(10), "a", 2.0), (ts(65), "a", 4.0), (ts(20), "b", 8.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("k", "window_start", "cnt", "total")
        .as[(String, java.sql.Timestamp, Long, Double)].collect().toSet
      assert(rows == Set(
        ("a", java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 2L, 3.0),
        ("a", java.sql.Timestamp.valueOf("2026-01-01 11:00:00"), 1L, 4.0),
        ("b", java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1L, 8.0)))
    } finally q.stop()
  }

  test("a materialized view stays fresh under streaming ingestion (foreachBatch refresh)") {
    // ClickHouse MVs are populated on INSERT; the streaming analog is
    // foreachBatch → MatView.refresh, each micro-batch appending its
    // O(batch) partial states. A mid-stream compact must not change reads.
    import graft.operators.MatView
    implicit val sqlCtx = spark.sqlContext
    val spec = MatView.spec(Seq("k"),
      MatView.countState("cnt"), MatView.sumState("sv", col("v")))
    val path = java.nio.file.Files.createTempDirectory("graft_mv_stream")
      .resolve("mv").toString
    val input = MemoryStream[(String, Double)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 0L) MatView.init(batch, spec, path)
        else MatView.refresh(batch, spec, path)
      }
      .start()
    try {
      input.addData(("a", 1.0), ("b", 2.0)); q.processAllAvailable()
      input.addData(("a", 4.0));             q.processAllAvailable()
      MatView.compact(spark, spec, path)     // background-merge analog
      input.addData(("b", 8.0), ("c", 16.0)); q.processAllAvailable()
      val got = MatView.read(spark, spec, path)
        .select("k", "cnt", "sv").as[(String, Long, Double)].collect().sortBy(_._1)
      assert(got.toSeq == Seq(("a", 2L, 5.0), ("b", 2L, 10.0), ("c", 1L, 16.0)))
    } finally q.stop()
  }

  test("WindowedAgg.session closes gap-separated sessions on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agged = WindowedAgg.session(
      input.toDF().toDF("ts", "k"),
      tsCol = "ts", watermarkDelay = "10 minutes", gapDur = "30 minutes",
      keys = Seq("k"), aggs = Seq(count(lit(1)).as("cnt")))
    val q = agged.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val base = java.sql.Timestamp.valueOf("2026-01-01 09:00:00")
      def ts(min: Int) = new java.sql.Timestamp(base.getTime + min.toLong * 60000)
      input.addData((ts(0), "a"), (ts(10), "a"), (ts(60), "a"), (ts(0), "b"))
      q.processAllAvailable()
      val rows = spark.table("sess_out").select("k", "cnt").as[(String, Long)]
        .collect().sorted
      assert(rows.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 1L)))
    } finally q.stop()
  }

  test("MergeTreeWrite.compact rewrites a partition into sorted files") {
    val df = Seq((5L, "e"), (1L, "a"), (3L, "c"), (2L, "b")).toDF("id", "v")
    val out = Files.createTempDirectory("compact").toString
    df.repartition(4).write.mode("overwrite").parquet(out) // fragmented
    val frag = spark.read.parquet(out)
    MergeTreeWrite.compact(frag, out + "_c", orderBy = Seq("id"), numFiles = 1)
    val files = new java.io.File(out + "_c").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    val back = spark.read.parquet(out + "_c").collect().map(_.getLong(0))
    assert(back.sorted.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("WindowedAgg.sliding emits overlapping windows") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min.toLong * 60000)
    val df = Seq((ts(0), "a"), (ts(45), "a")).toDF("ts", "k")
    val rows = WindowedAgg.sliding(df, "ts", "10 minutes", "1 hour", "30 minutes",
        Seq("k"), Seq(count(lit(1)).as("cnt")))
      .select("window_start", "cnt")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    // event at :00 lands in windows starting 09:30 and 10:00; :45 in 10:00 and 10:30
    assert(rows(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")) == 2L)
    assert(rows(java.sql.Timestamp.valueOf("2026-01-01 09:30:00")) == 1L)
    assert(rows(java.sql.Timestamp.valueOf("2026-01-01 10:30:00")) == 1L)
  }

  test("Skew.saltedJoin matches a plain join") {
    val big = spark.range(0, 10000)
      .select((col("id") % 5).as("k"), col("id").as("v"))   // 5 hot keys
    val small = Seq((0L, "x0"), (1L, "x1"), (2L, "x2"), (3L, "x3"), (4L, "x4"))
      .toDF("k", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltCount = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val plain = big.join(small, "k")
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(salted.orderBy("name").collect().toSeq == plain.orderBy("name").collect().toSeq)
  }

  test("Skew.skewedCountDistinct equals countDistinct") {
    val df = spark.range(0, 5000).select((col("id") % 3).as("k"), (col("id") % 97).as("v"))
    val out = Skew.skewedCountDistinct(df, Seq("k"), "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = df.groupBy("k").agg(countDistinct("v").as("u")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == ref.toSeq)
  }
}
