package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the engine.
  *
  * Local defaults mirror the driver harness (local[N], shuffle
  * partitions = cores); the cluster-relevant settings are the point:
  * AQE with skew-join handling and partition coalescing on, a real
  * broadcast threshold, UTC session time. On a 1000-executor cluster
  * only `master` and `shuffle.partitions` change (set partitions ≈
  * 2-3× total cores; AQE coalesces the excess).
  */
object GraftSession {
  /** Broadcast-join threshold. 64 MB comfortably broadcasts every dim
    * table at test scale; at 100× the `part`/`customer` dims outgrow
    * it and the dim joins silently fall back to shuffle joins (AQE
    * still localizes them when runtime stats allow). If executor
    * memory supports it, raise via SPARK_GRAFT_BROADCAST_MB so
    * star-schema joins stay broadcast at the real scale factor —
    * this is the one knob to revisit before a 100 TB run. */
  private def broadcastBytes: Long =
    sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MB", "64").toLong * 1024 * 1024

  def builder(appName: String = "graft",
              master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.map(_.toString).getOrElse(cores))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", broadcastBytes.toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    master.orElse(Some(s"local[$cores]")).foldLeft(b)(_ master _)
  }

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
