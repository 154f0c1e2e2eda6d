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
      spark.sql("""SELECT sequenceMatch('(?1)(?t<=3600)(?2)')(ts, etype='signup', etype='click') AS m
                   FROM funnel_events GROUP BY user_id""").collect()
    }
    assert(e.getMessage.contains("unsupported pattern atom")
      || e.getCause != null && e.getCause.getMessage.contains("unsupported pattern atom"))
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
