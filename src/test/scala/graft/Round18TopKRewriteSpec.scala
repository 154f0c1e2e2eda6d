package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round 18: [[graft.plans.TopKRewrite]] makes the ENGINE plan the
  * bounded-heap top-k automatically from the spelling users actually
  * write — `Filter(rn <= k, Window(row_number))` — instead of only
  * when they ask for groupArraySorted by name (q16b). The window plan
  * full-sorts every map task's input even under WindowGroupLimit
  * (docs/AUDIT_q16_wgl_r17.md); the rewritten plan sorts nothing but
  * the k-row result arrays and shuffles groups × k rows. */
class Round18TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Collect with the rewrite disabled — the reference semantics. */
  private def withRuleOff[T](body: => T): T = {
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try body finally spark.conf.set("spark.graft.topk.rewrite", "true")
  }

  private def base = Seq(
    ("a", 9.0, 1L, "x"), ("a", 9.0, 2L, "y"), ("a", 7.0, 3L, "z"), ("a", 5.0, 4L, "w"),
    ("b", 3.0, 5L, "p"), ("b", 8.0, 6L, "q"),
    ("c", 1.0, 7L, "r")
  ).toDF("g", "price", "key", "tag").repartition(5)

  private def topn(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("price").desc, col("key"))
    df.select(col("g"), col("price"), col("key"), col("tag"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= k)
      .orderBy("g", "rn")
  }

  test("rn <= k over row_number rewrites: no Window, graft_row_topk aggregate, rows unchanged") {
    val df = topn(base, 2)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"expected the Window gone:\n$plan")
    assert(plan.contains("graft_row_topk"), s"expected the bounded-heap aggregate:\n$plan")
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(topn(base, 2).collect().toSeq.map(_.toString))
    assert(got == want)
  }

  test("q16's registered query (unchanged text) now plans wgl=0 with identical rows") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q16_topn_per_group")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window "),
      s"q16 must plan through TopKRewrite:\n$plan")
    assert(plan.contains("graft_row_topk"))
    val got = df.collect().toSeq.map(_.toString)
    val want = withRuleOff(
      SparkEntry.queries("q16_topn_per_group")(spark, dir).collect().toSeq.map(_.toString))
    assert(got == want)
  }

  test("string sort keys, DESC and NULLS ordering match the window semantics exactly") {
    val df = Seq(
      ("g1", Some("pear"), 1L), ("g1", None, 2L), ("g1", Some("apple"), 3L),
      ("g1", Some("fig"), 4L), ("g2", None, 5L), ("g2", Some("date"), 6L)
    ).toDF("g", "s", "id").repartition(3)
    def q(d: DataFrame) = {
      val w = Window.partitionBy("g").orderBy(col("s").desc_nulls_last, col("id"))
      d.select(col("g"), col("s"), col("id"), row_number().over(w).as("rn"))
        .where(col("rn") <= 2).orderBy("g", "rn")
    }
    val got = q(df)
    assert(planOf(got).contains("graft_row_topk"))
    assert(got.collect().toSeq.map(_.toString) ==
      withRuleOff(q(df).collect().toSeq.map(_.toString)))
  }

  test("rn = 1 (the dedup spelling) rewrites with k=1") {
    val w = Window.partitionBy("g").orderBy(col("key"))
    val df = base.select(col("g"), col("key"), row_number().over(w).as("rn"))
      .where(col("rn") === 1).orderBy("g")
    assert(planOf(df).contains("graft_row_topk"))
    assert(df.select("g", "key").as[(String, Long)].collect().toSet ==
      Set(("a", 1L), ("b", 5L), ("c", 7L)))
  }

  test("rn < k and reversed literal-comparison spellings rewrite") {
    val w = Window.partitionBy("g").orderBy(col("key"))
    val lt = base.select(col("g"), col("key"), row_number().over(w).as("rn"))
      .where(col("rn") < 3)
    assert(planOf(lt).contains("graft_row_topk"))
    assert(lt.count() == withRuleOff(lt.count()))
    val rev = base.select(col("g"), col("key"), row_number().over(w).as("rn"))
      .where(lit(2) >= col("rn"))
    assert(planOf(rev).contains("graft_row_topk"))
  }

  test("residual conjuncts survive above the rewrite") {
    val w = Window.partitionBy("g").orderBy(col("price").desc, col("key"))
    def q = base.select(col("g"), col("price"), col("key"), row_number().over(w).as("rn"))
      .where(col("rn") <= 3 && col("price") > 6.0)
      .orderBy("g", "rn")
    assert(planOf(q).contains("graft_row_topk"))
    assert(q.collect().toSeq.map(_.toString) ==
      withRuleOff(q.collect().toSeq.map(_.toString)))
  }

  test("global top-k (empty PARTITION BY) rewrites — no global sort of the input") {
    val w = Window.orderBy(col("price").desc, col("key"))
    val df = base.select(col("key"), col("price"), row_number().over(w).as("rn"))
      .where(col("rn") <= 3).orderBy("rn")
    val plan = planOf(df)
    assert(plan.contains("graft_row_topk"), plan)
    assert(df.select("key").as[Long].collect().toSeq == Seq(1L, 2L, 6L))
  }

  test("rank/dense_rank route to the tie-admitting kernel, never the row heap (round 19)") {
    // round 18 refused these outright (a k-bounded row heap would
    // silently drop boundary ties); round 19 rewrites them onto
    // graft_rank_topk instead — Round19RankTopKSpec owns the semantics
    val w = Window.partitionBy("g").orderBy(col("key"))
    val r = base.select(col("g"), rank().over(w).as("rn")).where(col("rn") <= 2)
    assert(!planOf(r).contains("graft_row_topk"))
    assert(planOf(r).contains("graft_rank_topk"))
    val d = base.select(col("g"), dense_rank().over(w).as("rn")).where(col("rn") <= 2)
    assert(!planOf(d).contains("graft_row_topk"))
    assert(planOf(d).contains("graft_rank_topk"))
  }

  test("a second surviving window output blocks the rewrite") {
    val w = Window.partitionBy("g").orderBy(col("key"))
    val df = base.select(col("g"), col("key"),
        row_number().over(w).as("rn"), sum("price").over(w).as("cum"))
      .where(col("rn") <= 2)
    assert(!planOf(df).contains("graft_row_topk"))
  }

  test("k above spark.graft.topk.rewrite.maxK falls through to the window plan") {
    val w = Window.partitionBy("g").orderBy(col("key"))
    val df = base.select(col("g"), row_number().over(w).as("rn"))
      .where(col("rn") <= 100000)
    assert(!planOf(df).contains("graft_row_topk"))
  }

  test("opt-out conf restores the window plan") {
    withRuleOff {
      val plan = planOf(topn(base, 2))
      assert(!plan.contains("graft_row_topk"))
      assert(plan.contains("Window"))
    }
  }
}
