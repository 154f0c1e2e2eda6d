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
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n  = fn(spark, sfDir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
