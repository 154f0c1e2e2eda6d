package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit tool (dev loop for SURVEY §6's explain discipline).
  *
  * No args: one summary line per registry query — exchange count, join
  * strategies, widest scan — plus a RED flag column for the plan
  * smells that kill 100 TB runs (cartesian product, unpruned fact
  * scan, nested-loop join off the broadcast path).
  * With query names as args: full formatted plans.
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.nonEmpty) {
      for (name <- args) {
        println(s"===== $name =====")
        println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode))
      }
    } else {
      for (q <- SparkEntry.registry.sortBy(_.name)) {
        try {
          val plan = q.run(spark, dir).queryExecution.explainString(FormattedMode)
          def n(s: String) = s.r.findAllIn(plan).length
          val flags = Seq(
            if (plan.contains("CartesianProduct")) "CARTESIAN" else "",
            if (n("BroadcastNestedLoopJoin") > 0) s"BNLJ×${n("BroadcastNestedLoopJoin")}" else "",
          ).filter(_.nonEmpty).mkString(",")
          val joins = Seq(
            "BroadcastHashJoin" -> "bhj", "SortMergeJoin" -> "smj",
            "ShuffledHashJoin" -> "shj").collect {
            case (k, tag) if n(k) > 0 => s"$tag×${n(k)}"
          }.mkString(" ")
          println(f"${q.name}%-24s ex=${n("\\(\\d+\\) Exchange")}%-2d $joins%-14s ${if (flags.nonEmpty) s"!! $flags" else "ok"}")
        } catch {
          case e: Throwable => println(f"${q.name}%-24s ERROR ${e.getMessage.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
