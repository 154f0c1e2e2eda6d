package graft

import graft.operators.Projections
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** MergeTree projections: alternate sort layouts prune decode work
  * (parquet row-group stats), aggregate projections answer matching
  * GROUP BYs from partial states, and routing picks the right layout
  * from the query shape. */
class ProjectionsSpec extends SparkSpec {
  import spark.implicits._

  private val n = 100000
  private lazy val path: String = {
    // b is a permutation of [0, n): perfectly scattered w.r.t. id order
    val df = Seq.tabulate(n) { i =>
      (i.toLong, (i.toLong * 2654435761L) % n, i % 50, i.toDouble)
    }.toDF("id", "b", "c", "v")
    val p = java.nio.file.Files.createTempDirectory("graft_proj").toString
    Projections.write(df, p, baseOrder = Seq("id"), projections = Seq(
      Projections.Sort("by_b", Seq("b")),
      Projections.Agg("agg_c", Seq("c"), Seq(("cnt", "count", ""), ("sv", "sum", "v")))),
      filesPerLayout = 8)
    p
  }

  /** Rows the scan actually decoded (survivors of row-group pruning),
    * NOT the post-filter row count. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val fp = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    fp.collect { case s: FileSourceScanExec => s }.map(_.metrics("numOutputRows").value).sum
  }

  test("externalBase: the base layout IS the source table — never copied") {
    val df = Seq.tabulate(2000) { i =>
      (i.toLong, (i.toLong * 31) % 100, i % 20, i.toDouble)
    }.toDF("id", "b", "c", "v")
    val src = java.nio.file.Files.createTempDirectory("graft_proj_src").toString + "/t"
    df.write.parquet(src)
    val p = java.nio.file.Files.createTempDirectory("graft_proj_ext").toString
    Projections.write(spark.read.parquet(src), p, baseOrder = Seq("id"),
      projections = Seq(
        Projections.Sort("by_b", Seq("b"), Seq("b", "id")),
        Projections.Agg("agg_c", Seq("c"), Seq(("cnt", "count", "")))),
      filesPerLayout = 4, externalBase = Some(src))
    // no base directory lands — only the projections cost storage
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p, "base")))
    // the base fallback reads the SOURCE table (all rows, all columns)
    val (baseDf, baseName) = Projections.route(spark, p, filterCols = Set("v"))
    assert(baseName == "base" && baseDf.count() == 2000 &&
      baseDf.columns.toSet == Set("id", "b", "c", "v"))
    // projections still route and answer
    assert(Projections.route(spark, p, filterCols = Set("b"),
      neededCols = Set("b", "id"))._2 == "by_b")
    val agg = Projections.mergeAgg(spark, p, "agg_c").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(agg == (0 until 20).map(_ -> 100L).toMap)
  }

  test("routing: agg keys beat sort keys beat base") {
    assert(Projections.route(spark, path, groupByCols = Seq("c"))._2 == "agg_c")
    assert(Projections.route(spark, path, filterCols = Set("b"))._2 == "by_b")
    // filter on a non-leading / unknown column falls back to base
    assert(Projections.route(spark, path, filterCols = Set("v"))._2 == "base")
    assert(Projections.route(spark, path)._2 == "base")
    // a GROUP BY the agg projection can't serve exactly is not routed to it
    assert(Projections.route(spark, path, groupByCols = Seq("c", "b"))._2 == "base")
  }

  test("column-subset sort layout: routed only to covered queries, stores only the subset") {
    val df = Seq.tabulate(1000) { i =>
      (i.toLong, (i.toLong * 31) % 100, i % 50, i.toDouble, s"wide_$i")
    }.toDF("id", "b", "c", "v", "s")
    val p = java.nio.file.Files.createTempDirectory("graft_proj_sub").toString
    Projections.write(df, p, baseOrder = Seq("id"), projections = Seq(
      Projections.Sort("by_b_sub", Seq("b"), Seq("b", "id", "v"))), filesPerLayout = 4)
    // the layout holds only the declared columns
    assert(spark.read.parquet(s"$p/by_b_sub").schema.fieldNames.toSet == Set("b", "id", "v"))
    // covered needs → subset layout; uncovered needs (reads s) → base;
    // unknown needs (empty set = "all of them") → base
    assert(Projections.route(spark, p, filterCols = Set("b"),
      neededCols = Set("b", "v"))._2 == "by_b_sub")
    assert(Projections.route(spark, p, filterCols = Set("b"),
      neededCols = Set("b", "s"))._2 == "base")
    assert(Projections.route(spark, p, filterCols = Set("b"))._2 == "base")
    // same answer either way on a covered query
    val sub = Projections.route(spark, p, filterCols = Set("b"), neededCols = Set("b", "v"))._1
    assert(sub.where($"b" === 31L).agg(sum("v")).head().getDouble(0) ==
      spark.read.parquet(s"$p/base").where($"b" === 31L).agg(sum("v")).head().getDouble(0))
    // ORDER BY keys outside the stored subset refuse at declaration
    intercept[IllegalArgumentException] {
      Projections.Sort("bad", Seq("b"), Seq("id", "v"))
    }
  }

  test("sort projection prunes decode work for a selective leading-key range") {
    val pred = ($"b" >= 1000L && $"b" < 2000L)
    val routed = Projections.route(spark, path, filterCols = Set("b"))._1.where(pred)
    val base   = spark.read.parquet(s"$path/base").where(pred)
    // identical answers…
    assert(routed.agg(sum("v")).head().getDouble(0) == base.agg(sum("v")).head().getDouble(0))
    // …but the routed layout decodes a fraction of the rows: the range
    // covers 1% of the keyspace, so ≤ 1 of 8 range files survives the
    // row-group stats, while the base layout (b scattered) decodes all
    val decodedRouted = scanRows(routed)
    val decodedBase   = scanRows(base)
    assert(decodedBase == n.toLong, s"base should decode everything, got $decodedBase")
    assert(decodedRouted * 4 <= decodedBase,
      s"routed layout should prune decode work: $decodedRouted vs $decodedBase")
  }

  test("aggregate projection merges partial states to the exact answer") {
    val merged = Projections.mergeAgg(spark, path, "agg_c").orderBy("c").collect()
    assert(merged.length == 50)
    // group c = 0: ids 0, 50, … → cnt = n/50, sum v = sum of those ids
    val c0 = merged.head
    assert(c0.getAs[Long]("cnt") == n / 50)
    assert(c0.getAs[Double]("sv") == (0 until n by 50).map(_.toDouble).sum)
    // reading the projection touches rows ∝ groups, not facts
    assert(spark.read.parquet(s"$path/agg_c").count() == 50)
  }
}
