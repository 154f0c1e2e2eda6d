package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc inspector: show rows + formatted plan for named queries. */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-showq")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if args.isEmpty || args.exists(name.startsWith)) {
      println(s"===== $name")
      val df = fn(spark, sfDir)
      df.show(30, truncate = false)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
