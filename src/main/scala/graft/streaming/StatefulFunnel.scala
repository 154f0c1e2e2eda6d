package graft.streaming

import java.time.{DayOfWeek, LocalDate, ZoneOffset}
import java.time.temporal.{ChronoUnit, TemporalAdjusters}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous funnel / cohort-retention over a stream — the
  * state-store counterparts of the batch operators
  * [[graft.operators.Events.funnelLevels]] and
  * [[graft.operators.Events.cohortRetention]] (ClickHouse users run
  * windowFunnel/retention as continuous materialized views; reference
  * scanner targets the same family,
  * /root/reference/src/prompts/scanner.py:18-35).
  *
  * Both operators key state by user, so the only shuffle is the
  * groupByKey — the same single user-key shuffle as the batch
  * versions, amortized across micro-batches.
  *
  * State bounds (the months-of-uptime property):
  *  - funnel: 3 scalars per user (level, anchor time, last-step
  *    time); emits only on level change, so the output stream is
  *    bounded by users × steps, not by events.
  *  - retention: cohort week + the user's distinct active weeks
  *    (calendar-bounded) + emitted offsets. Each (user, week_offset)
  *    emits exactly once.
  *
  * Ordering contract: events are folded sorted within each
  * micro-batch; a funnel step arriving in a LATER batch than a
  * logically-earlier event can't rewind the fold (standard streaming
  * funnel semantics — batch and stream agree whenever delivery is
  * time-ordered across batches, which the spec exercises). Retention
  * has no such caveat: it buffers weeks until the cohort event
  * arrives, so any delivery order converges to the batch answer.
  */
object StatefulFunnel {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class FunnelState(level: Int, t1Us: Long, tpUs: Long)
  final case class LevelUpdate(user_id: Long, level: Int)
  final case class RetentionState(cohortWeekDay: Long, seenWeekDays: Seq[Long], emitted: Seq[Int])
  final case class RetentionUpdate(user_id: Long, week_offset: Int)

  private implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  private implicit val funnelStateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  private implicit val levelEnc: Encoder[LevelUpdate] = Encoders.product[LevelUpdate]
  private implicit val retStateEnc: Encoder[RetentionState] = Encoders.product[RetentionState]
  private implicit val retEnc: Encoder[RetentionUpdate] = Encoders.product[RetentionUpdate]
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Deepest funnel step per user, continuously. Emits (user, level)
    * whenever a user's level advances (Update mode). Fold semantics
    * match the batch operator: strictly-increasing timestamps, all
    * steps within `windowDays` of the user's first step-1 event. */
  def funnelUpdates(events: Dataset[Event], steps: Seq[String],
                    windowDays: Int = 7): Dataset[LevelUpdate] = {
    require(steps.nonEmpty)
    val winUs = windowDays.toLong * 86400L * 1000000L
    val stepSet = steps.toSet
    events
      .filter(e => stepSet(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val before = st.level
          // sort within the micro-batch on (time, type) — the same
          // tie-break as the batch operator's sort_array fold.
          // Full microsecond precision: Timestamp.getTime is ms-only
          // and the event data carries µs — an ms-truncated compare
          // can flip a `ts > t1` against the batch fold when two
          // steps fall in the same millisecond.
          def micros(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_type))
          for (e <- sorted if st.level < steps.length) {
            val tUs = micros(e.ts)
            val matches = e.event_type == steps(st.level)
            val timeOk = st.level == 0 || (tUs > st.tpUs && tUs <= st.t1Us + winUs)
            if (matches && timeOk) {
              st = FunnelState(st.level + 1, if (st.level == 0) tUs else st.t1Us, tUs)
            }
          }
          if (st.level != before) {
            state.update(st)
            Iterator(LevelUpdate(user, st.level))
          } else {
            if (sorted.nonEmpty && state.getOption.isEmpty) state.update(st)
            Iterator.empty
          }
      }
  }

  private def weekStart(ts: java.sql.Timestamp): Long =
    LocalDate.ofInstant(ts.toInstant, ZoneOffset.UTC)
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
      .toEpochDay

  /** Continuous cohort retention: emits each (user, week_offset)
    * exactly once, where offset = weeks between the user's cohort
    * week (first `cohortEvent`, Monday-start, UTC — matching the
    * batch date_trunc) and an active week at or after it. Activity
    * weeks seen before the cohort event arrives are buffered in
    * state, so late cohort discovery still converges to the batch
    * answer. Downstream, `count distinct user per offset` is a plain
    * aggregation over this exactly-once stream. */
  def retentionUpdates(events: Dataset[Event], cohortEvent: String): Dataset[RetentionUpdate] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Event], state: GroupState[RetentionState]) =>
          var st = state.getOption.getOrElse(RetentionState(-1L, Nil, Nil))
          var seen = st.seenWeekDays.toSet
          var cohort = st.cohortWeekDay
          evs.foreach { e =>
            val w = weekStart(e.ts)
            seen += w
            if (e.event_type == cohortEvent && (cohort < 0 || w < cohort)) cohort = w
          }
          if (cohort < 0) {
            state.update(RetentionState(cohort, seen.toSeq.sorted, Nil))
            Iterator.empty
          } else {
            val emitted = st.emitted.toSet
            val fresh = seen.filter(_ >= cohort)
              .map(w => ((w - cohort) / 7).toInt)
              .diff(emitted)
              .toSeq.sorted
            state.update(RetentionState(cohort, seen.toSeq.sorted, (emitted ++ fresh).toSeq.sorted))
            fresh.iterator.map(RetentionUpdate(user, _))
          }
      }
}
