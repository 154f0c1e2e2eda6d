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
  /** Queries whose BroadcastNestedLoopJoin is a DOCUMENTED bounded
    * anchor — a broadcast-cross probe against a side that is bounded
    * by construction (a 1-row probe vector, a ≤100-term query set, a
    * bounded sample), not an accidental nested loop over the corpus.
    * These print as `anchor(bounded)` so a bare `!!` in the audit is
    * ALWAYS a real defect to chase. Keep in sync with the operator
    * scaladocs (Similarity.bruteForceTopK / knnJoin,
    * TextAnalysis bm25/contamination/unigram probes, vec kernels). */
  val boundedAnchors: Set[String] = Set(
    "q44_embedding_dup",   // exact all-pairs counterpart, bounded slice by contract
    "q50_ann_brute",       // 1-row probe broadcast-cross
    "q52_knn_join_sample", // bounded probe sample broadcast-cross
    "q55_vector_math",     // scalar probe vector vs corpus
    "q56_unigram_logprob", // bounded query-term probe
    "q57_bm25",            // query-term probe joined before tf shuffle
  )

  def main(args: Array[String]): Unit = {
    // GraftSession.builder, not a hand-rolled one: the audit must see
    // the plans the bench/driver sessions produce (broadcast-threshold
    // policy, bucketed-scan ordering, AQE) or its ex=/sort counts
    // describe a session nobody runs.
    val spark = GraftSession.builder("graft-audit",
        master = Some("local[8]"), shufflePartitions = Some(8))
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
          val verdictTag =
            if (flags.isEmpty) "ok"
            else if (!plan.contains("CartesianProduct") && boundedAnchors.contains(q.name))
              s"anchor(bounded) $flags" // documented broadcast-cross probe, bounded by contract
            else s"!! $flags"
          println(f"${q.name}%-24s ex=${n("\\(\\d+\\) Exchange")}%-2d $joins%-14s $verdictTag")
        } catch {
          case e: Throwable => println(f"${q.name}%-24s ERROR ${e.getMessage.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
