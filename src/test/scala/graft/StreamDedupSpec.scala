package graft

import graft.streaming.{Doc, StreamDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Continuous exact dedup: first document per fingerprint survives
  * across batches; replays fold away; result equals the batch dedup
  * of the unioned input. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("admits the first doc per fingerprint across batches, drops replays") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc[String]]
    val out = StreamDedup.firstPerFingerprint(input.toDS())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate (higher id loses)
      input.addData(Doc("fpA", 2L, "a-dup"), Doc("fpA", 1L, "a"), Doc("fpB", 3L, "b"))
      q.processAllAvailable()
      // batch 2: replay of fpA (at-least-once delivery) + one new doc
      input.addData(Doc("fpA", 9L, "a-replay"), Doc("fpC", 4L, "c"))
      q.processAllAvailable()
      // batch 3: pure replays → nothing new
      input.addData(Doc("fpB", 99L, "b-replay"), Doc("fpC", 98L, "c-replay"))
      q.processAllAvailable()

      val got = spark.table("dedup_out").as[Doc[String]].collect()
        .map(d => d.fp -> (d.id, d.value)).toMap
      assert(got == Map("fpA" -> (1L, "a"), "fpB" -> (3L, "b"), "fpC" -> (4L, "c")))

      // equals the batch operator over the unioned input
      val all = Seq(
        Doc("fpA", 2L, "a-dup"), Doc("fpA", 1L, "a"), Doc("fpB", 3L, "b"),
        Doc("fpA", 9L, "a-replay"), Doc("fpC", 4L, "c"),
        Doc("fpB", 99L, "b-replay"), Doc("fpC", 98L, "c-replay")).toDS()
      val batchWinners = graft.operators.Dedup
        .exact(all.toDF().withColumnRenamed("id", "doc_id"), "doc_id", "fp")
        .select("fp", "keep_id").as[(String, Long)].collect().toMap
      assert(got.map { case (fp, (id, _)) => fp -> id } == batchWinners)
    } finally q.stop()
  }
}
