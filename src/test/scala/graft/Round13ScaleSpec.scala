package graft

import graft.sources.MergeTreeWrite
import org.apache.spark.sql.functions._

/** Round 13: bucket-count auto-dial — the last pinned layout dial
  * (q15b's `numBuckets = 8`) moved into code, per the round-12/13
  * "scale policy lives in code" program. */
class Round13ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("autoBucketCount: floors at 8, pow2, one bucket per ~256 MB, caps at 4096") {
    // range() stats are metadata (8 bytes/row), no job runs
    assert(MergeTreeWrite.autoBucketCount(spark.range(1000).toDF()) == 8)
    // 8 GB → 32 buckets of 256 MB
    assert(MergeTreeWrite.autoBucketCount(spark.range(1L << 30).toDF()) == 32)
    // 9 GB → rounds UP to the next pow2, never down past the target
    assert(MergeTreeWrite.autoBucketCount(spark.range((9L << 30) / 8).toDF()) == 64)
    // dial follows the LARGER side so both sides co-bucket at one count
    assert(MergeTreeWrite.autoBucketCount(
      spark.range(1000).toDF(), spark.range(1L << 30).toDF()) == 32)
    // 100 TB → capped, not 400k buckets
    assert(MergeTreeWrite.autoBucketCount(spark.range((100L << 40) / 8).toDF()) == 4096)
  }

  test("writeBucketed persists its count; landedBucketCount round-trips; marker-less is None") {
    val base = "/tmp/graft_bucket_marker_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.sql("DROP TABLE IF EXISTS bkt_marker_spec")
    val df = spark.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
    MergeTreeWrite.writeBucketed(df, "bkt_marker_spec", s"$base/t", "k", 16, Seq("k"))
    assert(MergeTreeWrite.landedBucketCount(s"$base/t").contains(16))
    assert(MergeTreeWrite.landedBucketCount(s"$base/nowhere").isEmpty)
  }
}
