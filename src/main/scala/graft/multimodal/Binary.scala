package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as an
  * opaque `binary` column plus a typed metadata struct, with batched
  * per-partition transforms for the decode/feature-extract stages.
  *
  * The decode step itself is STUBBED (no media codecs in this
  * environment): [[StubDecoder]] derives deterministic fake
  * width/height/frames from the payload hash. The Spark-side contract
  * — schema, partition-batched execution, metadata propagation — is
  * the real design and is what the tests cover: swap [[Decoder]] for a
  * JNI/codec-backed one and nothing else changes.
  *
  * Scale notes: payloads never pass through a shuffle — metadata is
  * extracted in a projection over the scan, and decode runs
  * `mapPartitions`-style on the scan partitions. Repartition by a
  * small key-only frame if needed BEFORE attaching payloads.
  */
object Binary {

  /** Decoded-media facts a real codec would produce. */
  final case class MediaInfo(width: Int, height: Int, frames: Int, ok: Boolean)

  /** The pluggable decode stage: bytes → MediaInfo, called once per
    * row inside a partition batch (open/close any native context per
    * PARTITION, not per row, in a real implementation). */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): MediaInfo
  }

  /** Deterministic fake decoder: dimensions derived from payload
    * bytes. Stands in for the codec the container doesn't have. */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte]): MediaInfo = {
      var h = 1125899906842597L // FNV-ish rolling hash, stable across JVMs
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      val w = 16 + (Math.floorMod(h, 240L)).toInt
      val ht = 16 + (Math.floorMod(h >> 8, 240L)).toInt
      MediaInfo(w, ht, 1 + Math.floorMod(h >> 16, 30L).toInt, ok = payload.nonEmpty)
    }
  }

  /** Cheap metadata over the payload — pure column expressions
    * (codegen'd): byte size, content md5, leading-bytes magic. */
  def withMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(payloadCol)).as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"),
      hex(substring(col(payloadCol), 1, 4)).as("magic")))

  /** Decode stage: per-partition batched application of `decoder`,
    * appending a `media_info` struct. Row-encoder based so it works
    * for any input schema. */
  def decodeStage(df: DataFrame, payloadCol: String,
                  decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("media_info",
      StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("frames", IntegerType, nullable = false),
        StructField("ok", BooleanType, nullable = false)))))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init happens here (native codec handle, etc.)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        // null payload (failed fetch) must not kill the stage — it
        // decodes to ok=false like any other undecodable media
        val info =
          if (bytes == null) MediaInfo(0, 0, 0, ok = false)
          else decoder.decode(bytes)
        Row.fromSeq(r.toSeq :+ Row(info.width, info.height, info.frames, info.ok))
      }
    }(enc)
  }

  /** Feature-extraction stage: payload bytes → fixed-width embedding
    * (`dim` floats). The real pipeline would run a vision/audio model
    * here; the stub derives a deterministic pseudo-embedding from a
    * rolling hash so the downstream contract — `array<float>` column
    * feeding [[graft.operators.Similarity]] — is exercised end to end. */
  def featureStage(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes0 = r.getAs[Array[Byte]](idx)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        var h = 1125899906842597L
        val out = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
        var d = 0
        while (d < dim) {
          h = h * 6364136223846793005L + 1442695040888963407L
          out(d) = ((h >>> 16).toInt % 1000) / 1000.0f
          d += 1
        }
        Row.fromSeq(r.toSeq :+ out.toSeq)
      }
    }(enc)
  }

  /** Frame-sampling shape: explode exactly min(`n`, frames)
    * evenly-spaced frame indexes per media row (zero-frame rows emit
    * nothing — explode drops the empty array). Keeps the payload
    * un-shuffled; output is (input columns, frame_idx). */
  def sampleFrames(df: DataFrame, framesCol: String, n: Int): DataFrame = {
    require(n >= 1)
    val frames = col(framesCol)
    val idxs = when(frames <= 0, array().cast("array<int>"))
      .when(frames <= n, sequence(lit(0), frames.cast("int") - 1))
      .otherwise(transform(sequence(lit(0), lit(n - 1)),
        i => floor(i * frames / n).cast("int")))
    df.withColumn("frame_idx", explode(idxs))
  }
}
