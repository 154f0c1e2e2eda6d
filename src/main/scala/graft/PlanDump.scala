package graft

import java.nio.file.{Files, Paths}

/** Dev-loop utility: write `.explain("formatted")` for named registry
  * queries to files — the plan evidence committed per optimization
  * round (plans/rNN/<query>_{before,after}.txt). Usage:
  * runMain graft.PlanDump <outDir> <suffix> <query> [query …]
  * ("all" dumps the full registry). Not part of the driver contract. */
private[graft] object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.lift(2).contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("plandump")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] $name ok")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
