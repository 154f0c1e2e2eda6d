package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregation helpers — the streaming
  * counterpart of the batch `toStartOf*` rollups (continuous
  * materialized views in ClickHouse terms).
  *
  * State bound: watermark delay caps how long a window stays open, so
  * executor state is O(open windows × keys), independent of stream
  * length — the property that lets these run for months on a real
  * cluster. Works identically on batch DataFrames (watermark is a
  * no-op there), which is how specs cross-check results.
  */
object WindowedAgg {

  /** Tumbling event-time windows: watermark on `tsCol`, group by
    * window(`windowDur`) × `keys`, apply `aggs`. Output carries
    * window_start/window_end plus keys and aggregates. */
  def tumbling(df: DataFrame, tsCol: String, watermarkDelay: String,
               windowDur: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Streaming sessionization: Spark's native `session_window` —
    * gap-closed sessions per key, state bounded by the watermark (the
    * streaming counterpart of [[graft.operators.Events.sessionize]]). */
  def session(df: DataFrame, tsCol: String, watermarkDelay: String,
              gapDur: String, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Sliding windows (`windowDur` every `slideDur`). */
  def sliding(df: DataFrame, tsCol: String, watermarkDelay: String,
              windowDur: String, slideDur: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }
}
