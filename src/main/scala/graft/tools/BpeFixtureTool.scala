package graft.tools

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Train a byte-level BPE fixture vocab on the documents corpus and
  * print the merge list as a Scala literal — the one-off step that
  * produced the `q64c_bpe_byte` fixture (a tokenizer vocab is train
  * once / apply forever, so the registry query pins a trained
  * constant the way a production pipeline pins its tokenizer file).
  *
  * Self-merges (a == b, e.g. "l l") are dropped from the printed
  * fixture: the DuckDB oracle replays merges as separator-joined
  * string replacement, which is exact for a ≠ b (pattern can't
  * overlap itself) but can pick a different leftover position on odd
  * same-symbol runs. Downstream merges referencing a dropped symbol
  * become unreachable dead rules in BOTH engines — consistent.
  *
  * Usage: BpeFixtureTool [numMerges]; SPARK_GRAFT_SF_DIR picks the
  * corpus (default sf0.01, the driver's verify scale).
  */
object BpeFixtureTool {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("graft-bpe-fixture")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val n = if (args.nonEmpty) args(0).toInt else 64
    val docs = Tables(spark, dir).documents
    val (merges, vocab) = TextAnalysis.bpeTrainBytes(docs, "text", n)
    val kept = merges.filter { case (a, b) => a != b }
    println(s"// trained ${merges.size} merges, ${kept.size} after dropping self-merges")
    println(s"// vocab symbols: ${vocab.count()}")
    println("val fixtureMerges: Seq[(String, String)] = Seq(")
    kept.foreach { case (a, b) => println(s"""  ("$a", "$b"),""") }
    println(")")
    spark.stop()
  }
}
