package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BM25 and contamination against planted ground truth. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val docs = Seq(
      (1L, "spark vector spark vector spark vector"),            // dense, short
      (2L, "vector " + Seq.fill(60)("filler").mkString(" ")),    // one hit, long
      (3L, Seq.fill(40)("noise").mkString(" ")),                 // no hits
      (4L, "vector model vector model"),                         // dense, 2 terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", "text", Seq("vector", "model"))
      .orderBy(desc("score")).collect()
    assert(out.map(_.getLong(0)).toSeq.take(2) == Seq(4L, 1L)) // both terms beat one
    assert(!out.map(_.getLong(0)).contains(3L))                 // no-hit doc absent
    // n_terms counts distinct matched terms
    assert(out.find(_.getLong(0) == 4L).get.getAs[Long]("n_terms") == 2L)
    assert(out.find(_.getLong(0) == 1L).get.getAs[Long]("n_terms") == 1L)
    // idf sanity: every score is positive and finite
    out.foreach(r => assert(r.getAs[Double]("score") > 0 && !r.getAs[Double]("score").isInfinite))
  }

  test("contamination: verbatim leak → 1.0, fresh doc → 0.0, partial in between") {
    val leak  = "alpha beta gamma delta epsilon zeta eta theta"
    val half  = "alpha beta gamma delta epsilon nine ten eleven twelve"
    val docs = Seq(
      (97L * 0, leak),                     // eval: verbatim copy of train doc 1
      (97L * 1, "pure unseen words only never in train corpus here"), // eval: fresh
      (97L * 2, half),                     // eval: first 5-gram shared, rest not
      (1L, leak),                          // train
      (2L, "other train text entirely unrelated to anything"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(docs, "doc_id", "text",
        col("doc_id") % 97 === 0, ngram = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("frac")).toMap
    assert(out(0L) == 1.0)
    assert(out(97L) == 0.0)
    assert(out(194L) > 0.0 && out(194L) < 1.0)
  }
}
