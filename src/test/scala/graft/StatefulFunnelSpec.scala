package graft

import graft.operators.Events
import graft.streaming.StatefulFunnel
import graft.streaming.StatefulFunnel.{Event, LevelUpdate, RetentionUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming funnel/retention cross-checked against the batch
  * operators: the same synthetic event history is run through
  * Events.funnelLevels / Events.cohortRetention in batch and through
  * the state-store operators fed micro-batch by micro-batch; final
  * answers must agree. */
class StatefulFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "cart", "purchase")

  private def ts(day: Int, hour: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-03-${day}%02d $hour%02d:00:00")

  /** Deterministic event history: 30 users with varied funnel depth,
    * gaps, wrong-order steps, and off-funnel noise. */
  private val history: Seq[Event] = (1 to 30).flatMap { u =>
    val base = Seq(Event(u.toLong, ts(u % 20 + 1, 1), "view"))
    val deeper =
      if (u % 3 == 0) Seq(Event(u.toLong, ts(u % 20 + 1, 5), "cart"),
                          Event(u.toLong, ts(u % 20 + 2, 3), "purchase"))
      else if (u % 3 == 1) Seq(Event(u.toLong, ts(u % 20 + 1, 4), "cart"))
      else Seq(Event(u.toLong, ts(u % 20 + 1, 2), "purchase")) // skips cart: stays level 1
    val noise = Seq(Event(u.toLong, ts(u % 20 + 3, 6), "scroll"))
    base ++ deeper ++ noise
  }.sortBy(e => (e.ts.getTime, e.user_id))

  test("streaming funnel levels converge to the batch funnelLevels answer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulFunnel.funnelUpdates(input.toDS(), steps, windowDays = 7)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Update).start()
    try {
      val (first, second) = history.splitAt(history.length / 2)
      input.addData(first: _*); q.processAllAvailable()
      input.addData(second: _*); q.processAllAvailable()
      // latest (= max, levels only advance) emitted level per user
      val got = spark.table("funnel_out").as[LevelUpdate]
        .groupBy("user_id").agg(max("level").as("level"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = Events.funnelLevels(history.toDF(), "user_id", "ts", "event_type", steps, windowDays = 7)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(want.nonEmpty && want.values.max == 3) // fixture exercises all depths
      assert(got == want)
    } finally q.stop()
  }

  test("streaming retention updates converge to the batch cohortRetention answer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StatefulFunnel.retentionUpdates(input.toDS(), cohortEvent = "view")
      .writeStream.format("memory").queryName("retention_out")
      .outputMode(OutputMode.Update).start()
    try {
      // deliver out of order across batches: retention buffers weeks
      // until the cohort event shows up, so this still converges
      val (early, late) = history.partition(_.user_id % 2 == 0)
      input.addData(late: _*); q.processAllAvailable()
      input.addData(early: _*); q.processAllAvailable()
      val updates = spark.table("retention_out").as[RetentionUpdate]
      // exactly-once: no duplicate (user, offset) pairs
      assert(updates.count() == updates.dropDuplicates("user_id", "week_offset").count())
      val got = updates.groupBy("week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = Events.cohortRetention(history.toDF(), "user_id", "ts", "event_type", "view")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(want.size >= 2)
      assert(got == want)
    } finally q.stop()
  }
}
