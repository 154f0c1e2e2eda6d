package graft

/** ClickHouse behavioral sequence aggregates (`windowFunnel`,
  * `sequenceMatch`, `retention`) in their native parametric SQL
  * spelling, against hand-built event timelines with known answers.
  * All three run in strict_increase mode (deterministic under equal
  * timestamps) — the edge cases below pin exactly that. */
class BehavioralAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hoursFromBase: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      + hoursFromBase.toLong * 3600000)

  private lazy val view: Unit = {
    Seq(
      // u1: clean 3-step chain inside any window
      (1L, ts(0), "signup"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // u2: click 48h after signup — outside a 24h window, inside 72h
      (2L, ts(0), "signup"), (2L, ts(48), "click"),
      // u3: never signs up
      (3L, ts(0), "click"), (3L, ts(1), "purchase"),
      // u4: chain buried mid-stream (noise before the signup)
      (4L, ts(0), "purchase"), (4L, ts(1), "click"), (4L, ts(2), "signup"),
      (4L, ts(3), "click"), (4L, ts(4), "purchase"),
      // u5: only the LATER signup starts a viable 24h chain (30h-12h=18h)
      (5L, ts(0), "signup"), (5L, ts(12), "signup"), (5L, ts(30), "click"),
      // u6: click at the SAME timestamp as signup — strict increase rejects
      (6L, ts(0), "signup"), (6L, ts(0), "click"),
    ).toDF("user_id", "ts", "etype")
      .repartition(7) // force partial-agg serialize/merge paths
      .createOrReplaceTempView("funnel_events")
  }

  private val funnelSql =
    """SELECT user_id,
             windowFunnel(%d)(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS level
       FROM funnel_events GROUP BY user_id ORDER BY user_id"""

  test("windowFunnel: levels, window bound, latest-start chain, strict ties") {
    view
    val day = spark.sql(funnelSql.format(86400)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(day == Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 3, 5L -> 2, 6L -> 1))
    // widen the window to 72h: u2's click now lands inside
    val threeDays = spark.sql(funnelSql.format(259200)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(threeDays(2L) == 2)
  }

  test("sequenceMatch: gap vs adjacency, strict timestamp increase") {
    view
    val r = spark.sql(
      """SELECT user_id,
               sequenceMatch('(?1).*(?2).*(?3)')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS full_path,
               sequenceMatch('(?2)(?3)')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS click_then_buy,
               sequenceMatch('(?1).*(?1)')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS two_signups
         FROM funnel_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toList
    assert(r == List(
      (1L, true,  true,  false),
      (2L, false, false, false),
      (3L, false, true,  false),  // click@1h → purchase? no: purchase@1h AFTER click@0h — adjacent, increasing
      (4L, true,  true,  false),
      (5L, false, false, true),
      (6L, false, false, false))) // signup/click tie: strict increase rejects
    // adjacency is positional among CONSIDERED events: u4's click@3h and
    // purchase@4h are consecutive considered events even with the full
    // condition set, but signup@2h→purchase@4h is not (click intervenes)
    val adj = spark.sql(
      """SELECT sequenceMatch('(?1)(?3)')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS m
         FROM funnel_events WHERE user_id = 4 GROUP BY user_id""").head()
    assert(!adj.getBoolean(0))
    // …but dropping 'click' from the conditions makes them adjacent
    val adj2 = spark.sql(
      """SELECT sequenceMatch('(?1)(?2)')(ts, etype = 'signup', etype = 'purchase') AS m
         FROM funnel_events WHERE user_id = 4 GROUP BY user_id""").head()
    assert(adj2.getBoolean(0))
  }

  test("sequenceMatch rejects unsupported pattern atoms loudly") {
    view
    val e = intercept[Exception] {
      spark.sql("""SELECT sequenceMatch('(?1)+(?2)')(ts, etype='signup', etype='click') AS m
                   FROM funnel_events GROUP BY user_id""").collect()
    }
    assert(e.getMessage.contains("unsupported pattern atom")
      || e.getCause != null && e.getCause.getMessage.contains("unsupported pattern atom"))
  }

  test("sequenceMatch time-bounded gaps (?t op N)") {
    view
    val r = spark.sql(
      """SELECT user_id,
               sequenceMatch('(?1)(?t<=3600)(?2)')(ts, etype = 'signup', etype = 'click') AS within_1h,
               sequenceMatch('(?1)(?t<3600)(?2)')(ts, etype = 'signup', etype = 'click') AS under_1h,
               sequenceMatch('(?1)(?t>86400)(?2)')(ts, etype = 'signup', etype = 'click') AS over_1d
         FROM funnel_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    // u1: click exactly 1h after signup — <= holds, strict < does not
    assert(r(1L) == ((true, false, false)))
    // u2: click 48h after signup — only the >1d bound holds
    assert(r(2L) == ((false, false, true)))
    // u5: the EARLIER signup is 30h before the click — only >1d holds
    // (the 18h gap from the later signup satisfies no bound)
    assert(r(5L) == ((false, false, true)))
    // u6: tie — strict increase rejects regardless of the bound
    assert(r(6L) == ((false, false, false)))
  }

  test("sequenceMatch '.' matches exactly one arbitrary event, strict-next") {
    view
    val r = spark.sql(
      """SELECT user_id,
               sequenceMatch('(?1).(?2)')(ts, etype = 'signup', etype = 'purchase') AS one_between,
               sequenceMatch('(?1)(?2)')(ts, etype = 'signup', etype = 'purchase') AS adjacent
         FROM funnel_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    // u1: signup@0, click@1, purchase@2 — '.' consumes the click; the
    // no-dot pattern also matches because only matching events are
    // considered there (signup→purchase adjacent among considered)
    assert(r(1L) == ((true, true)))
    // u4: …signup@2, click@3, purchase@4 — same shape mid-stream
    assert(r(4L) == ((true, true)))
    // u3: no signup at all
    assert(r(3L) == ((false, false)))
    // a '.' needs a DISTINCT third event: signup→purchase alone can't
    val lone = spark.sql(
      """SELECT sequenceMatch('(?1).(?2)')(ts, etype = 'click', etype = 'purchase') AS m
         FROM funnel_events WHERE user_id = 3 GROUP BY user_id""").head()
    assert(!lone.getBoolean(0)) // click@0, purchase@1: dot has no event to consume
  }

  test("sequenceCount honors time-bounded gaps") {
    view
    val r = spark.sql(
      """SELECT user_id,
               sequenceCount('(?1)(?t>3600)(?2)')(ts, etype = 'signup', etype = 'click') AS n
         FROM funnel_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(1L) == 0L) // click exactly 1h after — not > 1h
    assert(r(2L) == 1L) // 48h gap
    assert(r(5L) == 1L) // 18h gap from the later signup
  }

  private lazy val modeView: Unit = {
    Seq(
      // u7: signup→click→(foreign error)→purchase
      (7L, ts(0), "signup"), (7L, ts(1), "click"), (7L, ts(2), "error"), (7L, ts(3), "purchase"),
      // u8: signup→purchase(out of order)→click→purchase
      (8L, ts(0), "signup"), (8L, ts(1), "purchase"), (8L, ts(2), "click"), (8L, ts(3), "purchase"),
      // u9: signup→click→click(repeat)→purchase
      (9L, ts(0), "signup"), (9L, ts(1), "click"), (9L, ts(2), "click"), (9L, ts(3), "purchase"),
    ).toDF("user_id", "ts", "etype")
      .repartition(5)
      .createOrReplaceTempView("funnel_mode_events")
  }

  test("windowFunnel strict_order and strict_dedup modes") {
    modeView
    val r = spark.sql(
      """SELECT user_id,
               windowFunnel(86400)(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS dflt,
               windowFunnel(86400, 'strict_order')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS ord,
               windowFunnel(86400, 'strict_dedup')(ts, etype = 'signup', etype = 'click', etype = 'purchase') AS dedup
         FROM funnel_mode_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    // u7: the foreign 'error' event breaks the ordered chain at level 2
    assert(r(7L) == ((3, 2, 3)))
    // u8: the out-of-order purchase stops strict_order at the first gap
    assert(r(8L) == ((3, 1, 3)))
    // u9: the repeated click interrupts strict_dedup at level 2
    assert(r(9L) == ((3, 3, 2)))
    // combined modes compose: u7's foreign event still breaks the
    // order, u9's repeat still interrupts the dedup
    val both = spark.sql(
      """SELECT user_id,
               windowFunnel(86400, 'strict_order', 'strict_dedup')(ts,
                 etype = 'signup', etype = 'click', etype = 'purchase') AS l
         FROM funnel_mode_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(both == Map(7L -> 2, 8L -> 1, 9L -> 2))
  }

  test("whale-user guard: per-group cap keeps the earliest events, deterministically") {
    val whale = spark.range(0, 100000)
      .selectExpr("1 AS user_id", "timestamp_seconds(id) AS ts",
        "CASE WHEN id = 99999 THEN 'purchase' ELSE 'click' END AS etype")
      .repartition(8)
    whale.createOrReplaceTempView("whale_events")
    val sql =
      """SELECT windowFunnel(1000000)(ts, etype = 'click', etype = 'purchase') AS level
         FROM whale_events GROUP BY user_id"""
    assert(spark.sql(sql).head().getInt(0) == 2) // uncapped: full chain
    spark.conf.set("graft.sequence.maxGroupEvents", "1000")
    try {
      // capped: only the 1000 earliest events (all clicks) survive
      assert(spark.sql(sql).head().getInt(0) == 1)
      // cap larger than the group: unchanged result
      spark.conf.set("graft.sequence.maxGroupEvents", "200000")
      assert(spark.sql(sql).head().getInt(0) == 2)
    } finally spark.conf.unset("graft.sequence.maxGroupEvents")
  }

  test("retention: first-condition gate over per-user flags") {
    view
    val r = spark.sql(
      """SELECT user_id,
               retention(etype = 'signup', etype = 'click', etype = 'purchase') AS r
         FROM funnel_events GROUP BY user_id ORDER BY user_id""").collect()
      .map(row => row.getLong(0) -> row.getSeq[Int](1).toList).toMap
    assert(r(1L) == List(1, 1, 1))
    assert(r(2L) == List(1, 1, 0))
    assert(r(3L) == List(0, 0, 0)) // no signup: later flags gated off
    assert(r(5L) == List(1, 1, 0))
  }

  test("arrayJoin explodes like ClickHouse's row generator") {
    val out = spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS v").collect().map(_.getInt(0))
    assert(out.toList == List(1, 2, 3))
  }
}
