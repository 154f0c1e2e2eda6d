package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Catalog over a scale-factor directory of parquet tables (the
  * driver's TPC-H-ish star schema plus `events`/`documents`/
  * `embeddings`).
  *
  * This is also where the ClickPipe-analog source abstraction lives:
  * the reference replicates Postgres tables into ClickHouse
  * (/root/reference/src/tools/data_migrator.py:63-83 builds
  * tableMappings). Here a "source" is anything Spark can scan —
  * parquet dirs for tests, `spark.read.jdbc` with predicate-based
  * parallel partitioning for a real Postgres snapshot.
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Read a base table with the SCHEMA cached per (dir, table).
    *
    * `spark.read.parquet` without an explicit schema re-infers it on
    * every call — a driver-side footer read plus a listing/inference
    * job that measured ~18× the cost of a schema-given read (~240 ms
    * vs ~13 ms per call on this host). The registry calls
    * `Tables(s, dir).x` inside every query function and the bench
    * runs each query twice, so the same eight immutable parquet
    * tables were re-inferred ~650 times per bench pass. Caching the
    * inferred StructType (metadata only — every scan still reads the
    * parquet data) removes that fixed per-query tax. The inputs under
    * a scale-factor dir are immutable for the life of the process;
    * the cache is keyed by absolute path so distinct SF dirs never
    * collide. */
  def table(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = Tables.schemaCache.computeIfAbsent(
      path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** The events table is written with TIMESTAMP(NANOS) parquet, which
    * Spark has no native type for. Read nanos as long and truncate to
    * microseconds — exactly what DuckDB does when it loads the same
    * file, so oracle comparisons stay bit-identical. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Inferred parquet schemas for the immutable SF-dir base tables,
    * keyed by absolute file path (see [[Tables.table]]). Schemas
    * only — never data, never results. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** JDBC snapshot source shape (the real ClickPipe-analog path):
    * parallel partitioned read on a numeric key. Not exercised by the
    * local harness (no Postgres in the container) but this is the
    * contract production replication uses.
    */
  def jdbcSnapshot(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties(),
  ): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound, numPartitions, props)
}
