package graft

import graft.operators.Dedup
import graft.sources.MergeTreeWrite

/** Round-14 advice fixes: the SimHash block dial clamps on the
  * replication cost it drives (the combination count), and the
  * bucket-layout marker resolves through the Hadoop FileSystem like
  * the data write. */
class Round14AdviceSpec extends SparkSpec {

  test("autoSimHashBlocks clamps on C(blocks, d) <= 256, not a fixed +9 offset") {
    // d=3 keeps the historical cap: C(12,3)=220 <= 256, C(13,3)=286 > 256
    assert(Dedup.autoSimHashBlocks(Long.MaxValue, maxHamming = 3) == 12)
    // d=6: a +9 offset would allow 15 blocks = C(15,6)=5005 key rows
    // per doc; the combo clamp stops at 10 blocks = C(10,6)=210
    assert(Dedup.autoSimHashBlocks(Long.MaxValue, maxHamming = 6) == 10)
    // d=4: C(11,4)=330 > 256, C(10,4)=210 <= 256 → cap 10
    assert(Dedup.autoSimHashBlocks(Long.MaxValue, maxHamming = 4) == 10)
    // the lower bound still wins for tiny corpora
    assert(Dedup.autoSimHashBlocks(1, maxHamming = 6) == 7)
  }

  test("bucket marker round-trips through an explicit file: URI (Hadoop FS resolution)") {
    import spark.implicits._
    val base = s"/tmp/graft_r14_marker_${System.nanoTime()}"
    val df = (1 to 64).map(i => (i.toLong, s"v$i")).toDF("k", "s")
    spark.sql("DROP TABLE IF EXISTS graft_r14_marker")
    MergeTreeWrite.writeBucketed(df, "graft_r14_marker", s"file:$base/t", "k", 8)
    try {
      // the same scheme-qualified path the write used resolves the marker
      assert(MergeTreeWrite.landedBucketCount(s"file:$base/t").contains(8))
      // and the marker landed beside the data, not on a mangled local path
      assert(new java.io.File(s"$base/t/_GRAFT_BUCKETS").isFile)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_r14_marker")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
  }
}
