package graft

import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Dev-loop utility: per-stage timing of the IVF-PQ chain (fit /
  * encode / shortlist / re-rank) behind q53 bench investigations.
  * Not part of the driver contract. */
private[graft] object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("ivfprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nlist = args.headOption.map(_.toInt).getOrElse(16)
    val emb = Tables(spark, dir).embeddings
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val n = timed("count")(emb.count())
    println(s"n=$n nlist=$nlist")
    val probe = timed("probe")(emb.where(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).toArray)
    import graft.operators.Similarity
    val centers = timed("ivfFit")(Similarity.ivfFit(emb, "embedding", nlist))
    val books = timed("pqFit")(Similarity.pqFit(emb, "embedding", 8, 16))
    val assigned = emb
      .withColumn("cell", Similarity.nearestCell(col("embedding"), centers))
      .withColumn("codes", Similarity.pqEncode(col("embedding"), books))
    timed("encodeForced")(assigned.select(sum(element_at(col("codes"), 1)), sum(col("cell"))).collect())
    val pd = probe.map(_.toDouble)
    val shortlist = assigned
      .where(col("cell").isin(Similarity.nearestCells(pd, centers, 6): _*))
      .select(col("vec_id"), col("codes"))
      .withColumn("__approx", Similarity.pqScoreIp(col("codes"), pd, books))
      .orderBy(col("__approx").desc, col("vec_id"))
      .limit(40)
      .select(col("vec_id"))
    timed("shortlist")(shortlist.collect().length)
    val idx = (assigned, centers, books)
    timed("topk")(Similarity.ivfPqTopK(idx, "vec_id", "embedding", probe,
      k = 10, nprobe = 6, refine = 4).collect().length)
  }
}
