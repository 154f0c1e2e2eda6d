package graft

import graft.streaming.StreamNearDedup

/** Round-15 advice fixes: mortonEncode rejects negatives at every
  * arity (no infinite shift loop), base32Decode rejects data after a
  * padded group, and the streaming near-dedup state-key scheme is
  * version-stamped into the checkpoint with a fail-fast on resume
  * mismatch. */
class Round15AdviceSpec extends SparkSpec {

  test("mortonEncode rejects negative inputs at n=1 instead of hanging") {
    // n=1 → bit budget 64 → the old guard was skipped entirely and a
    // negative value spun the shift loop forever (j mod 64 wraps).
    val e = intercept[Exception](
      spark.sql("SELECT mortonEncode(CAST(-1 AS BIGINT))").collect())
    assert(e.getMessage.contains("does not fit"), e.getMessage)
    intercept[Exception](
      spark.sql("SELECT mortonEncode(CAST(-9223372036854775808 AS BIGINT))").collect())
    // non-negative n=1 stays the identity
    assert(spark.sql("SELECT mortonEncode(CAST(9223372036854775807 AS BIGINT)) AS v")
      .head().getLong(0) == Long.MaxValue)
    assert(spark.sql("SELECT mortonEncode(0) AS v").head().getLong(0) == 0L)
    // negatives still rejected at higher arities (budget < 64 path)
    intercept[Exception](spark.sql("SELECT mortonEncode(1, -2)").collect())
  }

  test("base32Decode rejects data after a padded group") {
    // padding in a non-final group: previously each 8-char group reset
    // its own pad counter, so this decoded to 'ff' instead of failing
    intercept[Exception](spark.sql("SELECT base32Decode('MY======MY======')").collect())
    intercept[Exception](spark.sql("SELECT base32Decode('MZXQ====MY======')").collect())
    // tryBase32Decode maps the same malformation to ''
    assert(spark.sql("SELECT tryBase32Decode('MY======MY======') AS v")
      .head().getString(0) == "")
    // multi-group inputs with padding ONLY in the final group still decode
    assert(spark.sql("SELECT base32Decode('NBSWY3DPEB3W64TMMQ======') AS v")
      .head().getString(0) == "hello world")
    // and unpadded multi-group round-trips are untouched
    assert(spark.sql("SELECT base32Decode(base32Encode('1234567890')) AS v")
      .head().getString(0) == "1234567890")
  }

  test("near-dedup checkpoint scheme marker: stamp, match, and fail-fast") {
    val base = s"/tmp/graft_r15_ckscheme_${System.nanoTime()}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    try {
      // fresh checkpoint → marker stamped with the v2 tag
      StreamNearDedup.ensureCheckpointScheme(spark, s"$base/a", maxHamming = 3)
      val marker = new org.apache.hadoop.fs.Path(s"$base/a/_GRAFT_KEY_SCHEME")
      assert(fs.exists(marker))
      // idempotent on the same dial
      StreamNearDedup.ensureCheckpointScheme(spark, s"$base/a", maxHamming = 3)
      // same checkpoint, different dial → refuse (re-keys state too)
      val e1 = intercept[IllegalStateException](
        StreamNearDedup.ensureCheckpointScheme(spark, s"$base/a", maxHamming = 3, blocks = 7))
      assert(e1.getMessage.contains("key scheme"), e1.getMessage)

      // pre-versioned checkpoint (offsets exist, no marker), dial that
      // packs DIFFERENTLY under v1 (bits % blocks != 0) → fail fast
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/b/offsets"))
      fs.create(new org.apache.hadoop.fs.Path(s"$base/b/offsets/0"), true).close()
      val e2 = intercept[IllegalStateException](
        StreamNearDedup.ensureCheckpointScheme(spark, s"$base/b", maxHamming = 3,
          bits = 64, blocks = 7))
      assert(e2.getMessage.contains("predates"), e2.getMessage)

      // pre-versioned checkpoint, bit-identical dial (bits % blocks == 0)
      // → adopted in place, marker written
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/c/offsets"))
      fs.create(new org.apache.hadoop.fs.Path(s"$base/c/offsets/0"), true).close()
      StreamNearDedup.ensureCheckpointScheme(spark, s"$base/c", maxHamming = 3) // 60 % 4 == 0
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/c/_GRAFT_KEY_SCHEME")))
    } finally fs.delete(new org.apache.hadoop.fs.Path(base), true)
  }
}
