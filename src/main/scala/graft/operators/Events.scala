package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators in the ClickHouse style: gap
  * sessionization, windowFunnel, cohort retention, histogram
  * (reference scanner hunts for exactly this query family —
  * /root/reference/src/prompts/scanner.py:18-35; the funnel/retention
  * combinators are the ClickHouse parametric-aggregate analogs).
  *
  * Scale notes: everything here is one shuffle on the user key (the
  * window/groupBy partitioning), then map-side work. Timestamps are
  * compared in integral microseconds — no float time math, identical
  * semantics in any engine.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    * Adds `session_idx` (1-based per user). One shuffle on userCol. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** windowFunnel analog: deepest step of `steps` (event-type names,
    * in order) each user reaches with strictly-increasing timestamps,
    * all within `windowDays` of step 1. Returns (userCol, level).
    * Each step is one filtered min-aggregate — map-side combined,
    * shuffling only (user, ts) pairs. */
  def funnelLevels(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowDays: Int = 7): DataFrame = {
    require(steps.nonEmpty)
    // prefixes(i) = users reaching step i+1, with t1..t(i+1) earliest-
    // completion timestamps. Each extension is one filtered agg + one
    // join on the user key.
    val first = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val prefixes = steps.zipWithIndex.tail.scanLeft(first) { case (acc, (step, i)) =>
      df.where(col(typeCol) === step)
        .join(acc, userCol)
        .where(col(tsCol) > col(s"t$i") &&
               col(tsCol) <= col("t1") + expr(s"INTERVAL $windowDays DAY"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as(s"t${i + 1}"),
             (1 to i).map(k => max(col(s"t$k")).as(s"t$k")): _*)
    }
    prefixes.zipWithIndex
      .map { case (d, i) => d.select(col(userCol), lit(i + 1).as("level")) }
      .reduce(_ union _)
      .groupBy(col(userCol)).agg(max(col("level")).as("level"))
  }

  /** Cohort retention: users grouped by the week of their first
    * `cohortEvent`, counted as retained in each later week they have
    * any activity. Returns (week_offset, n_users). */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, cohortEvent: String): DataFrame = {
    val cohort = df.where(col(typeCol) === cohortEvent)
      .groupBy(col(userCol)).agg(min(date_trunc("week", col(tsCol))).as("cw"))
    val activity = df.select(col(userCol), date_trunc("week", col(tsCol)).as("aw")).distinct()
    activity.join(cohort, userCol)
      .where(col("aw") >= col("cw"))
      .select(col(userCol),
        (datediff(col("aw").cast("date"), col("cw").cast("date")) / 7).cast("int").as("week_offset"))
      .groupBy("week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Fixed-grid histogram: `numBuckets` equal buckets over [lo, hi);
    * values ≥ hi clamp into the last bucket. Single map-side-combined
    * aggregation. */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, numBuckets: Int): DataFrame = {
    val width = (hi - lo) / numBuckets
    val bucket = least(floor((col(valueCol) - lo) / width), lit(numBuckets - 1L)).cast("long")
    df.select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo", round(lit(lo) + col("bucket") * width, 6))
      .withColumn("hi", round(lit(lo) + (col("bucket") + 1) * width, 6))
  }
}
