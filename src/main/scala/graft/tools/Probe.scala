package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: repeat-time registry queries in one JVM to separate
  * first-run cost (analysis + codegen + JIT) from steady-state
  * execution — `Bench` charges each query exactly once, so a slow
  * line there can be either, and the fix differs (plan size vs
  * actual work). Usage: Probe [queryName...] (defaults to the LSH
  * dedup family); SPARK_GRAFT_SF_DIR picks the scale factor. */
object Probe {
  def main(args: Array[String]): Unit = {
    // same session policy as the bench — see Audit.scala's rationale
    val spark = graft.GraftSession.builder("graft-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/region.parquet").count()
    val qs = if (args.nonEmpty) args.toSeq
             else Seq("q42_minhash_lsh", "q43_simhash", "q51_ann_lsh")
    for (q <- qs; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.queryExecution.executedPlan // force parse/analyze/optimize/plan
      val t1 = System.nanoTime()
      val n = df.collect().length
      val t2 = System.nanoTime()
      println(f"$q rep$rep: plan ${(t1 - t0) / 1e9}%.2f s + exec ${(t2 - t1) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
