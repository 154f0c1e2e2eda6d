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

  /** Epoch microseconds tolerant of both TIMESTAMP and TIMESTAMP_NTZ
    * inputs (parquet without isAdjustedToUTC reads as NTZ; session tz
    * is UTC, so the cast is value-preserving and matches DuckDB's
    * epoch_us). `unix_micros` itself rejects NTZ. */
  private[graft] def epochMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    * Adds `session_idx` (1-based per user). One shuffle on userCol. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull ||
        epochMicros(col(tsCol)) - epochMicros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** windowFunnel analog: deepest step of `steps` (event-type names,
    * in order) each user reaches with strictly-increasing timestamps,
    * all within `windowDays` of step 1 (anchor = user's earliest
    * step-1 event). Returns (userCol, level) for users at level ≥ 1.
    *
    * Single-pass design: ONE shuffle collects each user's funnel-type
    * events as a sorted array, then a fold advances the funnel state
    * per user — at 100 TB the fact table moves through the cluster
    * once, not once per step. Per-user state is bounded by that
    * user's funnel-event count (filtered to `steps` types before the
    * shuffle). Ties at equal timestamps sort candidate next-step
    * events after the anchor (strict `>` semantics) because the sort
    * is on (time, type) and the fold requires strictly-later times. */
  def funnelLevels(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowDays: Int = 7): DataFrame = {
    require(steps.nonEmpty)
    val winUs = windowDays.toLong * 86400L * 1000000L
    val stepArr = array(steps.map(lit(_)): _*)
    val perUser = df
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol), epochMicros(col(tsCol)).as("t"), col(typeCol).as("y"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("evs"))
    val zero = struct(
      lit(0).as("lv"), lit(null).cast("long").as("t1"), lit(null).cast("long").as("tp"))
    val folded = aggregate(col("evs"), zero, (acc, e) => {
      val lv = acc.getField("lv")
      val matches = e.getField("y") === element_at(stepArr, lv + 1)
      val timeOk = (lv === 0) ||
        (e.getField("t") > acc.getField("tp") &&
         e.getField("t") <= acc.getField("t1") + lit(winUs))
      val advance = (lv < steps.length) && matches && timeOk
      when(advance, struct(
        (lv + 1).as("lv"),
        when(lv === 0, e.getField("t")).otherwise(acc.getField("t1")).as("t1"),
        e.getField("t").as("tp")))
        .otherwise(acc)
    })
    perUser.select(col(userCol), folded.getField("lv").as("level"))
      .where(col("level") >= 1)
  }

  /** Cohort retention: users grouped by the week of their first
    * `cohortEvent`, counted as retained in each later week they have
    * any activity. Returns (week_offset, n_users).
    *
    * Single-pass: one shuffle on the user key computes both the
    * cohort week (conditional min) and the distinct active-week set
    * (bounded by calendar weeks, not events); offsets then aggregate
    * over a tiny (user, week) table. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, cohortEvent: String): DataFrame =
    df.select(col(userCol), date_trunc("week", col(tsCol)).as("w"), col(typeCol))
      .groupBy(col(userCol))
      .agg(min(when(col(typeCol) === cohortEvent, col("w"))).as("cw"),
           collect_set(col("w")).as("aws"))
      .where(col("cw").isNotNull)
      .select(col(userCol), col("cw"), explode(col("aws")).as("aw"))
      .where(col("aw") >= col("cw"))
      .select(col(userCol),
        (datediff(col("aw").cast("date"), col("cw").cast("date")) / 7).cast("int").as("week_offset"))
      .groupBy("week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))

  /** Fixed-grid histogram: `numBuckets` equal buckets over [lo, hi);
    * values outside the range clamp into the first/last bucket.
    * Single map-side-combined aggregation. */
  def histogram(df: DataFrame, valueCol: String,
                lo: Double, hi: Double, numBuckets: Int): DataFrame = {
    require(hi > lo && numBuckets >= 1, "need hi > lo and numBuckets >= 1")
    val width = (hi - lo) / numBuckets
    val bucket = greatest(
      least(floor((col(valueCol) - lo) / width), lit(numBuckets - 1L)),
      lit(0L)).cast("long")
    df.select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lo", round(lit(lo) + col("bucket") * width, 6))
      .withColumn("hi", round(lit(lo) + (col("bucket") + 1) * width, 6))
  }
}
