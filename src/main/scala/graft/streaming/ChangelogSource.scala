package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** File-based CDC CAPTURE: tail a directory of JSONEachRow changelog
  * files in the Debezium envelope shape and surface them as
  * [[Change]] records ready for [[CdcApply.latestByKey]].
  *
  * The reference's CDC ClickPipe tails the Postgres WAL
  * (/root/reference/src/tools/data_migrator.py:14-27); the Spark-first
  * equivalent of "a capture agent appends change files, the engine
  * tails them" is Structured Streaming's FILE SOURCE: each appended
  * file is discovered exactly once (checkpointed file index), schema
  * is enforced up front, and everything downstream is the ordinary
  * CdcApply state machine — so capture → apply is executable offline
  * against a directory, no database required.
  *
  * Envelope (one JSON object per line, Debezium file-connector shape):
  * {{{
  *   {"op":"c","after":{…},"source":{"lsn":12,"ts_ms":…}}
  *   {"op":"u","before":{…},"after":{…},"source":{"lsn":13}}
  *   {"op":"d","before":{…},"source":{"lsn":14}}
  * }}}
  * `op` c/r/u take the `after` image, `d` the `before` image (its last
  * known value rides the tombstone); `source.lsn` is the version —
  * CdcApply's monotonic fold makes delivery safe under at-least-once
  * and out-of-order files.
  *
  * Scale notes: the file listing is the only driver-side state
  * (bounded by `maxFileAge`/cleanup options of the stock file source);
  * parsing is distributed and the per-key state downstream is
  * hash-partitioned — the same envelope as every other streaming
  * operator here.
  */
object ChangelogSource {

  /** Untyped face: columns (key, version, deleted, value) where
    * `value` is a struct of `valueSchemaDDL`. */
  def changes(spark: SparkSession, dir: String, valueSchemaDDL: String,
              keyField: String): DataFrame =
    spark.readStream
      .schema(s"op STRING, before STRUCT<$valueSchemaDDL>, after STRUCT<$valueSchemaDDL>, " +
        "source STRUCT<lsn BIGINT, ts_ms BIGINT>")
      .json(dir)
      .select(
        coalesce(col(s"after.`$keyField`"), col(s"before.`$keyField`")).as("key"),
        col("source.lsn").as("version"),
        (col("op") === "d").as("deleted"),
        when(col("op") === "d", col("before")).otherwise(col("after")).as("value"))

  /** Typed face: the same stream as `Dataset[Change[K, V]]`, the exact
    * input type of [[CdcApply.latestByKey]]. */
  def typedChanges[K, V](spark: SparkSession, dir: String, valueSchemaDDL: String,
                         keyField: String)(
      implicit enc: Encoder[Change[K, V]]): Dataset[Change[K, V]] =
    changes(spark, dir, valueSchemaDDL, keyField).as[Change[K, V]]
}
