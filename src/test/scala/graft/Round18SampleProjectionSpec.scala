package graft

/** Round 18 — the seam two features share: `SAMPLE k` (the
  * content-addressed md5-bucket filter, [[graft.operators.Sampling]])
  * on a table that ALSO carries a sort projection. The sampler's
  * bucket predicate must COMPOSE with [[graft.plans.SortProjectionUse]]
  * routing, not defeat it: the leading-sort-key conjunct still prunes
  * into the projection layout, and the bucket conjunct rides along and
  * re-applies on the projection scan. */
class Round18SampleProjectionSpec extends SparkSpec {

  private def setup(): Unit = {
    dropWithLocation("spp_t")
    spark.sql("""CREATE TABLE spp_t (id UInt64, prio String, total Float64)
                 ENGINE = MergeTree ORDER BY id""")
    graft.sources.Tables(spark, "/root/testdata/sf0.001").orders
      .createOrReplaceTempView("spp_src")
    spark.sql("""INSERT INTO spp_t SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM spp_src""")
    spark.sql("ALTER TABLE spp_t ADD PROJECTION by_prio (SELECT * ORDER BY prio)")
    graft.operators.Sampling.registerSampleBy("spp_t", "CAST(id AS STRING)")
  }

  test("SAMPLE composes with sort-projection routing: pruned layout AND bucket filter both engage") {
    setup()
    try {
      val q = """SELECT id, round(total, 2) AS total FROM spp_t SAMPLE 0.5
                 WHERE prio = '1-URGENT' ORDER BY id"""
      val out = spark.sql(q)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_proj_by_prio"),
        s"sort-projection routing must survive the SAMPLE rewrite:\n$plan")
      assert(plan.toLowerCase.contains("md5"),
        s"the sampler's bucket filter must survive the projection swap:\n$plan")
      val got = out.collect().map(_.toString).toSeq

      // semantics: identical to the base-table plan with routing off
      spark.conf.set("spark.graft.projections.autoUse", "false")
      val want = try {
        val base = spark.sql(q)
        assert(!base.queryExecution.executedPlan.toString.contains("_graft_proj_"),
          "opt-out must fall back to the base scan")
        base.collect().map(_.toString).toSeq
      } finally spark.conf.set("spark.graft.projections.autoUse", "true")
      assert(got == want)

      // the sample is a real strict subset of the filtered base table
      val full = spark.sql("SELECT count(*) FROM spp_t WHERE prio = '1-URGENT'").head.getLong(0)
      assert(got.nonEmpty && got.size < full,
        s"SAMPLE 0.5 must keep a strict non-empty subset (${got.size} of $full)")
    } finally dropWithLocation("spp_t")
  }

  test("SAMPLE alone (no sort-key predicate) stays on the base scan — nothing to prune with") {
    setup()
    try {
      val out = spark.sql("SELECT count(*) AS n FROM spp_t SAMPLE 0.25")
      assert(!out.queryExecution.executedPlan.toString.contains("_graft_proj_"),
        "a bucket-only filter has no leading-sort-key conjunct; routing must not engage")
      val n = out.head.getLong(0)
      val full = spark.sql("SELECT count(*) FROM spp_t").head.getLong(0)
      assert(n > 0 && n < full)
    } finally dropWithLocation("spp_t")
  }
}
