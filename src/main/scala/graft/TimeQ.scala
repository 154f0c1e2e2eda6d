package graft

/** Dev-loop utility: time named registry queries end to end (plan +
  * execute + count) at sf0.01 — the quick per-query profiler behind
  * bench investigations. Not part of the driver contract. */
private[graft] object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("timeq")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
  }
}
