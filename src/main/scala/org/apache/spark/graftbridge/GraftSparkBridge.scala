package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Package-private bridge into Spark internals used only by the bench
  * harness (never by query plans).
  *
  * `LiveListenerBus.waitUntilEmpty()` is `private[spark]`; the bench's
  * per-query spill accounting (round 17) needs it so task-end metrics
  * posted asynchronously on the listener bus are fully drained before
  * the counters are snapshotted — otherwise a heavy query's spill can
  * be attributed to whichever query runs next.
  */
object GraftSparkBridge {
  /** Block until all queued listener events are delivered (bounded by
    * Spark's own internal timeout). Never throws: a timeout just means
    * the snapshot may lag by a few events, which is noise-level for
    * spill accounting.
    */
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
