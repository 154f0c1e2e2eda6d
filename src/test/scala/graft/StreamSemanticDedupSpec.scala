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

  test("NaN cosine (zero-norm vectors) flags the later arrival — NaN-greater batch/oracle parity") {
    // Ground truth for the parity claim: Spark's round() passes NaN
    // through and orders NaN greater than any value, so in the batch
    // operator (and DuckDB) round(cos,4) >= τ is TRUE for a NaN
    // cosine and the later zero-norm duplicate is dropped.
    assert(spark.sql("SELECT round(CAST('NaN' AS DOUBLE), 4) >= 0.85 AS hit")
      .collect()(0).getBoolean(0))
    implicit val sqlCtx = spark.sqlContext
    val z = Array(0.0, 0.0)
    val nz = Array(1.0, 1.0)
    val input = MemoryStream[VecDoc]
    val out = StreamSemanticDedup.hitsPerBucket(input.toDS(), minCos = 0.85)
    val q = out.writeStream.format("memory").queryName("semdedup_nan")
      .outputMode(OutputMode.Update).start()
    try {
      // two zero-norm vectors + one nonzero, all one bucket: every
      // pair involving a zero vector has cosine 0/0 = NaN → hit
      input.addData(VecDoc(2L, 1L, z), VecDoc(2L, 2L, z), VecDoc(2L, 3L, nz))
      q.processAllAvailable()
      val got = spark.table("semdedup_nan").as[CosHit].collect()
        .map(h => h.id -> ((h.earlier, h.cos))).toMap
      assert(got.keySet == Set(2L, 3L))
      assert(got(2L)._1 == 1L && got(2L)._2.isNaN)
      assert(got(3L)._1 == 1L && got(3L)._2.isNaN) // smallest earlier id wins
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
