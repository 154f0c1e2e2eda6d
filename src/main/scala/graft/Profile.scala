package graft

/** Ad-hoc single-query profiler: run a registry query N times at a
  * scale-factor dir and print per-run wall times plus the formatted
  * plan. Usage: runMain graft.Profile <queryName> [runs] [sfDir]. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name  = args.headOption.getOrElse("q28b_scalar_gauntlet")
    val runs  = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-profile")
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    // per-run job/task counters — a DDL/streaming chain's cost is its
    // JOB count as much as its wall time, and wall time alone cannot
    // show a removed pass on a noisy host
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      org.apache.spark.graftbridge.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (j0, k0) = (jobs.get, tasks.get)
      val (sm0, sd0, sw0) = (spillMem.get, spillDisk.get, shufWrite.get)
      graft.FixtureClock.reset()
      val t0 = System.nanoTime()
      val n  = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      println(f"run $i: $sec%.3f s (setup ${graft.FixtureClock.nanos / 1e9}%.3f s, " +
        f"$n rows, jobs ${jobs.get - j0}, tasks ${tasks.get - k0}, " +
        f"spillMem ${(spillMem.get - sm0) / 1e9}%.2f GB, spillDisk ${(spillDisk.get - sd0) / 1e9}%.2f GB, " +
        f"shufWrite ${(shufWrite.get - sw0) / 1e9}%.2f GB)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
