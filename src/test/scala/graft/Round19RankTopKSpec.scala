package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Literal, LessThanOrEqual, Rank, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition, SpecifiedWindowFrame, RangeFrame, UnboundedPreceding, CurrentRow}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Window => LWindow, WindowGroupLimit}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKRewrite

/** Round 19: [[graft.plans.TopKRewrite]] extends to rank() and
  * dense_rank() with the tie-admitting [[graft.plans.GraftRankTopK]]
  * kernel — `rank() <= k` keeps every boundary tie (possibly >k rows)
  * and skips ranks after ties; `dense_rank() <= k` keeps all rows of
  * the top k distinct key values. A k-bounded row heap (the round-18
  * row_number kernel) would silently drop those rows, which is exactly
  * why round 18 refused these shapes; this spec pins the semantics,
  * the guards, and the tie-overflow loud failure. */
class Round19RankTopKSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try body finally spark.conf.set("spark.graft.topk.rewrite", "true")
  }

  /** Tie-rich fixture: (group, int score with duplicates, unique id). */
  private def base = Seq(
    ("a", 9, 1L), ("a", 9, 2L), ("a", 7, 3L), ("a", 7, 4L), ("a", 7, 5L), ("a", 5, 6L),
    ("b", 3, 7L), ("b", 3, 8L), ("b", 3, 9L), ("b", 3, 10L), ("b", 1, 11L),
    ("c", 2, 12L)
  ).toDF("g", "score", "id").repartition(5)

  private def rankQ(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("score").desc)
    df.select(col("g"), col("score"), col("id"), rank().over(w).as("rk"))
      .where(col("rk") <= k)
      .orderBy("g", "rk", "id")
  }

  private def denseQ(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("score").desc)
    df.select(col("g"), col("score"), col("id"), dense_rank().over(w).as("rk"))
      .where(col("rk") <= k)
      .orderBy("g", "rk", "id")
  }

  test("rank <= k rewrites to graft_rank_topk and admits boundary ties beyond k") {
    val df = rankQ(base, 2)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"expected the Window gone:\n$plan")
    assert(plan.contains("graft_rank_topk"), s"expected the tie-admitting aggregate:\n$plan")
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(rankQ(base, 2).collect().toSeq.map(_.toString))
    assert(got == want)
    // group a: rank 1 ties (9,9) fill k=2 — 2 rows; group b: rank 1 is
    // a FOUR-row tie group, all admitted though k=2
    val byG = df.collect().groupBy(_.getString(0))
    assert(byG("a").length == 2)
    assert(byG("b").length == 4, "rank<=2 must keep the whole 4-row boundary tie group")
  }

  test("rank gaps after ties are faithful (rank, not dense_rank)") {
    // group a scores desc: 9,9,7,7,7,5 → ranks 1,1,3,3,3,6
    val rows = rankQ(base, 3).collect().filter(_.getString(0) == "a")
    assert(rows.map(_.getInt(3)).toSeq.sorted == Seq(1, 1, 3, 3, 3))
  }

  test("dense_rank <= k keeps all rows of the top k distinct values") {
    val df = denseQ(base, 2)
    val plan = planOf(df)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_rank_topk"), plan)
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(denseQ(base, 2).collect().toSeq.map(_.toString))
    assert(got == want)
    // group a dense ranks: 9→1, 7→2 → five rows (2 + 3)
    assert(df.collect().count(_.getString(0) == "a") == 5)
  }

  test("randomized parity with the window plan across partitions (rank + dense_rank)") {
    val rnd = new scala.util.Random(19)
    val data = Seq.tabulate(3000)(i => (rnd.nextInt(7), rnd.nextInt(40), i.toLong))
    val df = data.toDF("g", "score", "id").repartition(13)
    for (k <- Seq(1, 3, 10)) {
      val r = rankQ(df, k)
      assert(planOf(r).contains("graft_rank_topk"))
      assert(r.collect().toSeq.map(_.toString) ==
        withRuleOff(rankQ(df, k).collect().toSeq.map(_.toString)), s"rank k=$k")
      val d = denseQ(df, k)
      assert(d.collect().toSeq.map(_.toString) ==
        withRuleOff(denseQ(df, k).collect().toSeq.map(_.toString)), s"dense k=$k")
    }
  }

  test("global rank (empty PARTITION BY) rewrites and ties at the boundary survive") {
    val w = Window.orderBy(col("score").desc)
    val df = base.select(col("score"), col("id"), rank().over(w).as("rk"))
      .where(col("rk") <= 3).orderBy("rk", "id")
    assert(planOf(df).contains("graft_rank_topk"))
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(base.select(col("score"), col("id"), rank().over(w).as("rk"))
      .where(col("rk") <= 3).orderBy("rk", "id").collect().toSeq.map(_.toString))
    assert(got == want)
  }

  test("string sort keys with DESC / NULLS ordering match the window semantics") {
    val df = Seq(
      ("g1", Some("pear"), 1L), ("g1", Some("pear"), 2L), ("g1", None, 3L),
      ("g1", Some("apple"), 4L), ("g2", None, 5L), ("g2", None, 6L), ("g2", Some("date"), 7L)
    ).toDF("g", "s", "id").repartition(3)
    def q(d: DataFrame) = {
      val w = Window.partitionBy("g").orderBy(col("s").desc_nulls_last)
      d.select(col("g"), col("s"), col("id"), rank().over(w).as("rk"))
        .where(col("rk") <= 1).orderBy("g", "id")
    }
    val got = q(df)
    assert(planOf(got).contains("graft_rank_topk"))
    assert(got.collect().toSeq.map(_.toString) ==
      withRuleOff(q(df).collect().toSeq.map(_.toString)))
  }

  test("float/double sort keys refuse back to the window plan (tie equality diverges)") {
    val w = Window.partitionBy("g").orderBy(col("price").desc)
    val df = Seq(("a", 1.5), ("a", 2.5)).toDF("g", "price")
      .select(col("g"), rank().over(w).as("rk")).where(col("rk") <= 2)
    val plan = planOf(df)
    assert(!plan.contains("graft_rank_topk"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("residual conjuncts survive above the rewrite") {
    def q = {
      val w = Window.partitionBy("g").orderBy(col("score").desc)
      base.select(col("g"), col("score"), col("id"), rank().over(w).as("rk"))
        .where(col("rk") <= 3 && col("id") % 2 === 0)
        .orderBy("g", "rk", "id")
    }
    assert(planOf(q).contains("graft_rank_topk"))
    assert(q.collect().toSeq.map(_.toString) ==
      withRuleOff(q.collect().toSeq.map(_.toString)))
  }

  test("tie blow-up past maxTieRows fails loudly, naming the opt-out conf") {
    spark.conf.set("spark.graft.topk.rewrite.maxTieRows", "3")
    try {
      val df = Seq.tabulate(8)(i => ("a", 1, i.toLong)).toDF("g", "score", "id")
        .repartition(1)
      val q = rankQ(df, 1) // all 8 rows tie at rank 1 → buffer > 3
      assert(planOf(q).contains("graft_rank_topk"))
      val e = intercept[Exception](q.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      val all = msgs(e).mkString("\n")
      assert(all.contains("graft_rank_topk buffered") &&
        all.contains("spark.graft.topk.rewrite=false"), all)
    } finally spark.conf.unset("spark.graft.topk.rewrite.maxTieRows")
  }

  test("a WindowGroupLimit that does not correspond to the window blocks the rewrite") {
    // hand-built plan: the Window computes rank() but the WGL below it
    // carries RowNumber with limit 1 < k — a rule that discarded it
    // would change results; TopKRewrite must fall through untouched
    val child = base.queryExecution.analyzed
    val g = child.output.find(_.name == "g").get
    val score = child.output.find(_.name == "score").get
    val order = SortOrder(score, Ascending)
    val frame = SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)
    val wexpr = WindowExpression(Rank(Seq(score)),
      WindowSpecDefinition(Seq(g), Seq(order), frame))
    val al = Alias(wexpr, "rk")()
    val mismatched = WindowGroupLimit(Seq(g), Seq(order), RowNumber(), 1, child)
    val win = LWindow(Seq(al), Seq(g), Seq(order), mismatched, None)
    val filt = LFilter(LessThanOrEqual(al.toAttribute, Literal(3)), win)
    val out = TopKRewrite(spark).apply(filt)
    assert(out eq filt, s"mismatched WGL must block the rewrite:\n$out")
    // …and a CORRESPONDING one (same specs, same rank fn, limit ≥ k)
    // is subsumed
    val matching = WindowGroupLimit(Seq(g), Seq(order), Rank(Seq(score)), 3, child)
    val win2 = LWindow(Seq(al), Seq(g), Seq(order), matching, None)
    val filt2 = LFilter(LessThanOrEqual(al.toAttribute, Literal(3)), win2)
    val out2 = TopKRewrite(spark).apply(filt2)
    assert(!(out2 eq filt2) && out2.toString.contains("graft_rank_topk"), s"$out2")
  }

  test("malformed conf values fall back to defaults instead of failing the optimizer") {
    spark.conf.set("spark.graft.topk.rewrite", "tru")
    spark.conf.set("spark.graft.topk.rewrite.maxK", "1k")
    try {
      val df = rankQ(base, 2)
      assert(planOf(df).contains("graft_rank_topk")) // defaults: enabled, maxK 1000
      assert(df.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.graft.topk.rewrite", "true")
      spark.conf.unset("spark.graft.topk.rewrite.maxK")
    }
  }

  test("q29k_limit_ties (unchanged text) engages the rank kernel with identical rows") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q29k_limit_ties")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("graft_rank_topk"), s"q29k must plan through the rank rewrite:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), plan)
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(
      SparkEntry.queries("q29k_limit_ties")(spark, dir).collect().toSeq.map(_.toString))
    assert(got == want)
  }

  test("q16c_rank_ties (the new gate) plans wgl 0 / no window sort with identical rows") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q16c_rank_ties")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("graft_rank_topk") && !plan.contains("WindowGroupLimit"), plan)
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(
      SparkEntry.queries("q16c_rank_ties")(spark, dir).collect().toSeq.map(_.toString))
    assert(got == want)
  }

  test("opt-out conf restores the window plan for rank shapes") {
    withRuleOff {
      val plan = planOf(rankQ(base, 2))
      assert(!plan.contains("graft_rank_topk"))
      assert(plan.contains("Window"))
    }
  }
}
