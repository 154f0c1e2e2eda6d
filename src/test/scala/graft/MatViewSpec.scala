package graft

import graft.operators.MatView
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: init + O(delta)
  * refreshes must equal a full recompute; compaction must not change
  * reads; HLL distinct states must survive the parquet round trip. */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mv_$tag")
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private lazy val raw = Seq.tabulate(900) { i =>
    (i.toLong, s"k${i % 5}", (i % 97).toDouble, (i % 37).toLong)
  }.toDF("id", "k", "v", "u")

  private val spec = MatView.spec(Seq("k"),
    MatView.countState("cnt"),
    MatView.sumState("s", col("v")),
    MatView.minState("lo", col("v")),
    MatView.maxState("hi", col("v")),
    MatView.hllCountState("uniq_u", col("u")))

  private def expected = raw.groupBy("k")
    .agg(count(lit(1)).as("cnt"), sum("v").as("s"), min("v").as("lo"),
         max("v").as("hi"), countDistinct("u").as("exact_u"))
    .orderBy("k").collect()

  test("init + incremental refreshes == full recompute") {
    val path = tmpPath("inc")
    MatView.init(raw.where($"id" < 300), spec, path)
    MatView.refresh(raw.where($"id" >= 300 && $"id" < 700), spec, path)
    MatView.refresh(raw.where($"id" >= 700), spec, path)
    val got = MatView.read(spark, spec, path).orderBy("k").collect()
    val exp = expected
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1))        // cnt
      assert(g.getDouble(2) == e.getDouble(2))    // sum
      assert(g.getDouble(3) == e.getDouble(3))    // min
      assert(g.getDouble(4) == e.getDouble(4))    // max
      // 37 distinct values are far inside HLL exactness territory
      assert(g.getLong(5) == e.getLong(5))        // uniq via sketch
    }
    // three appends → at least three state rows per key before merge
    assert(spark.read.parquet(path).groupBy("k").count().agg(min("count"))
      .head().getLong(0) >= 3L)
  }

  test("compaction collapses parts and leaves reads identical") {
    val path = tmpPath("cmp")
    MatView.init(raw.where($"id" < 450), spec, path)
    MatView.refresh(raw.where($"id" >= 450), spec, path)
    val before = MatView.read(spark, spec, path).orderBy("k").collect()
    MatView.compact(spark, spec, path)
    val after = MatView.read(spark, spec, path).orderBy("k").collect()
    assert(before.map(_.toString).toSeq == after.map(_.toString).toSeq)
    // exactly one state row per group remains
    val parts = spark.read.parquet(path).groupBy("k").count().collect()
    assert(parts.forall(_.getLong(1) == 1L))
    // and compaction is idempotent
    MatView.compact(spark, spec, path)
    assert(MatView.read(spark, spec, path).orderBy("k").collect()
      .map(_.toString).toSeq == after.map(_.toString).toSeq)
  }

  test("refresh of an empty delta is a no-op for reads") {
    val path = tmpPath("empty")
    MatView.init(raw, spec, path)
    val before = MatView.read(spark, spec, path).orderBy("k").collect()
    MatView.refresh(raw.where($"id" < 0), spec, path)
    val after = MatView.read(spark, spec, path).orderBy("k").collect()
    assert(before.map(_.toString).toSeq == after.map(_.toString).toSeq)
  }
}
