package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc per-query timer: `runMain graft.tools.TimeQ q16 q28b` times
  * each named query (prefix match) twice at SPARK_GRAFT_SF_DIR. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-timeq")
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    for ((name, fn) <- wanted; round <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIMEQ $name%-28s r$round ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
