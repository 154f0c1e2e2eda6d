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

  test("sampleFrames explodes bounded evenly-spaced frame indexes") {
    val df = Binary.decodeStage(media, "payload")
      .select(col("id"), col("media_info.frames").as("frames"))
    val sampled = Binary.sampleFrames(df, "frames", n = 4)
    val counts = sampled.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frames = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    counts.foreach { case (id, n) => assert(n >= 1 && n <= frames(id)) }
  }
}
