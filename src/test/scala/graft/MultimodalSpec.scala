package graft

import graft.multimodal.Binary
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "fake-image-bytes-aaaa"),
    (2L, "fake-video-bytes-bbbb-longer-payload"),
  ).toDF("id", "s").withColumn("payload", col("s").cast("binary")).drop("s")

  test("withMeta extracts byte length, md5 and magic as a typed struct") {
    val r = Binary.withMeta(media, "payload").orderBy("id")
      .select("id", "media_meta.n_bytes", "media_meta.magic").collect()
    assert(r(0).getInt(1) == "fake-image-bytes-aaaa".getBytes.length)
    assert(r(0).getString(2) == "66616B65") // hex of "fake"
  }

  test("decodeStage appends deterministic media_info without touching input columns") {
    val out = Binary.decodeStage(media, "payload")
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "media_info"))
    val r1 = out.orderBy("id").select("media_info.width", "media_info.height", "media_info.ok").collect()
    val r2 = out.orderBy("id").select("media_info.width", "media_info.height", "media_info.ok").collect()
    assert(r1.toSeq == r2.toSeq)                       // deterministic
    assert(r1.forall(_.getBoolean(2)))                 // non-empty payloads decode ok
    assert(r1.forall(r => r.getInt(0) >= 16 && r.getInt(0) < 256))
  }

  test("featureStage feeds the similarity operators end to end") {
    val many = (1L to 50L).map(i => (i, s"payload-number-$i"))
      .toDF("id", "s").withColumn("payload", col("s").cast("binary")).drop("s")
    val feats = graft.multimodal.Binary.featureStage(many, "payload", dim = 8)
    assert(feats.schema("features").dataType.simpleString == "array<float>")
    // identical payloads → identical features → cosine 1.0 via ANN path
    val dup = graft.multimodal.Binary.featureStage(
      many.where(col("id") === 7L).withColumn("id", lit(999L)), "payload", dim = 8)
    val top = graft.operators.Similarity.bruteForceTopK(
      feats.union(dup), "id", "features", probeId = 999L, k = 1).collect()
    assert(top.head.getLong(0) == 7L && top.head.getDouble(1) === 1.0)
  }

  test("sampleFrames explodes exactly min(n, frames) indexes; 0-frame rows drop") {
    val df = Seq((1L, 10), (2L, 2), (3L, 0)).toDF("id", "frames")
    val sampled = Binary.sampleFrames(df, "frames", n = 3)
    val byId = sampled.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getAs[Int]("frame_idx")).sorted.toSeq).toMap
    assert(byId(1L) == Seq(0, 3, 6))   // 3 evenly-spaced of 10
    assert(byId(2L) == Seq(0, 1))      // fewer frames than n → all
    assert(!byId.contains(3L))         // zero frames → no rows
  }

  test("decodeStage survives null payloads as ok=false") {
    val withNull = media.union(
      Seq((3L, null.asInstanceOf[String])).toDF("id", "s")
        .withColumn("payload", col("s").cast("binary")).drop("s"))
    val out = Binary.decodeStage(withNull, "payload")
      .select("id", "media_info.ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(3L) == false && out(1L) == true)
  }
}
