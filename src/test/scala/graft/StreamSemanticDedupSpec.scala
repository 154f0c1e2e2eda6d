package graft

import graft.streaming.{CosHit, StreamSemanticDedup, VecDoc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Continuous semantic dedup: a vector is flagged when an
  * earlier-arrived vector in the same hyperplane bucket has rounded
  * cosine ≥ τ, across batches — exactly batch semanticDedup's
  * per-vector survivorship under arrival-ordered ids. */
class StreamSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("flags same-bucket cosine hits across batches; different bucket never hits") {
    implicit val sqlCtx = spark.sqlContext
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e1close = Array(0.995, 0.1, 0.0, 0.0) // cos ≈ 0.995 with e1
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val input = MemoryStream[VecDoc]
    val out = StreamSemanticDedup.hitsPerBucket(input.toDS(), minCos = 0.85)
    val q = out.writeStream.format("memory").queryName("semdedup_out")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two orthogonal vectors in the same bucket + one
      // near-parallel of e1 in a DIFFERENT bucket (no hit: bucket gate)
      input.addData(VecDoc(7L, 1L, e1), VecDoc(7L, 2L, e2), VecDoc(9L, 3L, e1close))
      q.processAllAvailable()
      // batch 2: near-parallel of e1 in e1's bucket (cross-batch hit),
      // exact replay of e2 (cos 1.0)
      input.addData(VecDoc(7L, 10L, e1close), VecDoc(7L, 11L, e2))
      q.processAllAvailable()

      val got = spark.table("semdedup_out").as[CosHit].collect()
        .map(h => h.id -> ((h.earlier, h.cos))).toMap
      val expCos = StreamSemanticDedup.round4(
        0.995 / math.sqrt(0.995 * 0.995 + 0.1 * 0.1))
      assert(got == Map(10L -> ((1L, expCos)), 11L -> ((2L, 1.0))))
    } finally q.stop()
  }

  test("within a batch, id order arbitrates and the smallest matching earlier id is reported") {
    implicit val sqlCtx = spark.sqlContext
    val v = Array(1.0, 1.0)
    val input = MemoryStream[VecDoc]
    val out = StreamSemanticDedup.hitsPerBucket(input.toDS(), minCos = 0.85)
    val q = out.writeStream.format("memory").queryName("semdedup_order")
      .outputMode(OutputMode.Update).start()
    try {
      // delivered out of id order inside one batch: 5 then 1 then 3
      input.addData(VecDoc(4L, 5L, v), VecDoc(4L, 1L, v), VecDoc(4L, 3L, v))
      q.processAllAvailable()
      val got = spark.table("semdedup_order").as[CosHit].collect()
        .map(h => h.id -> h.earlier).toMap
      assert(got == Map(3L -> 1L, 5L -> 1L)) // 1 survives; both later ids hit id 1
    } finally q.stop()
  }
}
