package graft

import graft.streaming.{CdcApply, Change, Materialized}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  test("CdcApply.latestByKey over a stream: latest wins, tombstones flow, stale drops") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change[Long, String]]
    val q = CdcApply.latestByKey(input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        Change(1L, 1L, deleted = false, "a"),
        Change(1L, 2L, deleted = false, "b"),
        Change(2L, 1L, deleted = false, "x"))
      q.processAllAvailable()
      val b1 = spark.table("cdc_out").as[Materialized[Long, String]].collect()
      assert(b1.toSet == Set(
        Materialized(1L, 2L, deleted = false, "b"),
        Materialized(2L, 1L, deleted = false, "x")))

      input.addData(
        Change(1L, 1L, deleted = false, "stale"),   // out-of-order duplicate: ignored
        Change(2L, 3L, deleted = true, "x"))        // tombstone
      q.processAllAvailable()
      val all = spark.table("cdc_out").as[Materialized[Long, String]].collect()
      // batch 2 emitted ONLY key 2's tombstone (key 1 unchanged)
      assert(all.length == 3)
      assert(all.contains(Materialized(2L, 3L, deleted = true, "x")))
    } finally q.stop()
  }

  test("CdcApply.latestByKey on a batch Dataset matches Replicate semantics") {
    val ds = Seq(
      Change(1L, 1L, deleted = false, "a"),
      Change(1L, 3L, deleted = false, "c"),
      Change(1L, 2L, deleted = false, "b"),
      Change(2L, 2L, deleted = true, "gone"),
    ).toDS()
    val out = CdcApply.latestByKey(ds).collect().toSet
    assert(out == Set(
      Materialized(1L, 3L, deleted = false, "c"),
      Materialized(2L, 2L, deleted = true, "gone")))
  }
}
