package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change-log record: latest `version` per `key` wins; a record
  * with `deleted = true` is a tombstone. */
final case class Change[K, V](key: K, version: Long, deleted: Boolean, value: V)

/** Current materialized state of one key (tombstones carried so sinks
  * can propagate deletes; filter `!deleted` for a ReplacingMergeTree-
  * FINAL view). */
final case class Materialized[K, V](key: K, version: Long, deleted: Boolean, value: V)

/** Structured-Streaming CDC apply — the continuous version of
  * [[graft.operators.Replicate.applyCdc]] and the Spark-first analog
  * of the reference's CDC / CDC_ONLY ClickPipe modes
  * (/root/reference/src/tools/data_migrator.py:14-27).
  *
  * State is one [[Materialized]] row per key, updated monotonically by
  * version — out-of-order and duplicate deliveries fold away, so the
  * operator is safe under at-least-once sources. Emits in Update mode:
  * downstream sees each key's new state exactly when it changes.
  *
  * Scale notes: state is hash-partitioned by key across executors
  * (one shuffle), size is O(live keys), and per-batch work is O(batch)
  * — the same contract ClickHouse's ReplacingMergeTree background
  * merge provides, but incremental. Also works on a batch Dataset
  * (empty initial state), which is how the spec cross-checks it
  * against the batch operator.
  */
object CdcApply {

  def latestByKey[K, V](changes: Dataset[Change[K, V]])(
      implicit kEnc: Encoder[K], mEnc: Encoder[Materialized[K, V]]): Dataset[Materialized[K, V]] =
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: K, it: Iterator[Change[K, V]], state: GroupState[Materialized[K, V]]) => {
          val prev = state.getOption.orNull
          val best = it.foldLeft(prev) { (cur, ch) =>
            if (cur == null || ch.version > cur.version)
              Materialized(key, ch.version, ch.deleted, ch.value)
            else cur
          }
          if (best == null || (prev != null && best.version == prev.version)) Iterator.empty
          else { state.update(best); Iterator.single(best) }
        })
}
