package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.MatView

/** Continuously-maintained materialized view — the Spark face of
  * ClickHouse's Kafka engine → MV → AggregatingMergeTree chain (the
  * reference's CDC targets kept fresh without re-scans,
  * /root/reference/src/tools/data_migrator.py's real-time mode):
  * `readStream → attach → start`, and the [[MatView]] store under
  * `path` stays queryable with `MatView.read` at any moment.
  *
  * Each micro-batch pays one map-side-combined aggregation over the
  * DELTA only (O(batch), never a store re-scan) and lands its partial
  * states under `batch=<id>/`. Structured Streaming re-delivers the
  * last uncommitted batch after a failure (at-least-once), and
  * [[MatView.refreshOnce]] makes the append idempotent via the
  * per-batch `_SUCCESS` marker — so the store is exactly-once even
  * though the channel isn't. State never lives in the streaming
  * checkpoint (the store IS the state), which keeps restarts trivial
  * and the view readable by any other session while ingestion runs.
  */
object StreamingMatView {

  /** Attach view maintenance to a streaming DataFrame; call
    * `.start()` (with a checkpoint location) on the result. */
  def attach(stream: DataFrame, spec: MatView.Spec, path: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      MatView.refreshOnce(batch.toDF(), spec, path, batchId)
      ()
    }
}
