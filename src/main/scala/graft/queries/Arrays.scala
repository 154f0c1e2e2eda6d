package graft.queries

import graft.GraftQuery
import graft.functions.ch
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Wave K of SURVEY.md §2: sampling, array analytics and conditional
  * tiering — the remaining ClickHouse idioms a migrated user leans on
  * (`arrayJoin`, `groupArray`+array functions, `multiIf`, SAMPLE).
  */
object Arrays {

  /** Deterministic systematic sample (key ≡ 0 mod 100) + aggregate:
    * reproducible sampling, unlike fraction-based TABLESAMPLE. */
  val q90 = GraftQuery(
    "q90_sample_systematic",
    (s, dir) => Tables(s, dir).lineitem
      .where(ch.systematicSample(col("l_orderkey"), 100))
      .agg(count(lit(1)).as("cnt"),
           round(sum("l_extendedprice"), 2).as("total"),
           countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS total,
                   count(DISTINCT l_orderkey) AS n_orders
            FROM lineitem WHERE l_orderkey % 100 = 0"""),
  )

  /** groupArray → array functions → arrayJoin round trip: per-customer
    * order stats computed on collected arrays. */
  val q91 = GraftQuery(
    "q91_array_analytics",
    (s, dir) => Tables(s, dir).orders
      .groupBy(col("o_custkey"))
      .agg(ch.groupArraySorted(col("o_orderkey")).as("keys"),
           ch.groupUniqArray(col("o_orderpriority")).as("prios"))
      .select(col("o_custkey"),
        size(col("keys")).as("n_orders"),
        size(col("prios")).as("n_prios"),
        array_contains(col("prios"), "1-URGENT").cast("int").as("has_urgent"),
        col("keys").getItem(0).as("first_key"),
        element_at(col("keys"), -1).as("last_key"))
      .orderBy("o_custkey"),
    Some("""SELECT o_custkey,
                   len(list_sort(list(o_orderkey))) AS n_orders,
                   len(list_distinct(list(o_orderpriority))) AS n_prios,
                   CAST(list_contains(list(o_orderpriority), '1-URGENT') AS INTEGER) AS has_urgent,
                   list_sort(list(o_orderkey))[1] AS first_key,
                   list_sort(list(o_orderkey))[-1] AS last_key
            FROM orders GROUP BY 1 ORDER BY o_custkey"""),
  )

  /** multiIf tiering of customers by account balance. */
  val q92 = GraftQuery(
    "q92_multiif_tiers",
    (s, dir) => Tables(s, dir).customer
      .select(ch.multiIf(Seq(
          (col("c_acctbal") < 0, lit("negative")),
          (col("c_acctbal") < 5000, lit("mid"))),
          lit("high")).as("tier"))
      .groupBy("tier").agg(count(lit(1)).as("cnt"))
      .orderBy("tier"),
    Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                        WHEN c_acctbal < 5000 THEN 'mid'
                        ELSE 'high' END AS tier, count(*) AS cnt
            FROM customer GROUP BY 1 ORDER BY tier"""),
  )

  /** ASOF JOIN: last-click attribution — for every purchase, the
    * latest preceding click of the same user. */
  val q93 = GraftQuery(
    "q93_asof_attribution",
    (s, dir) => {
      val e = Tables(s, dir).events
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
                col("ts").as("click_ts"))
      graft.operators.AsofJoin.join(purchases, clicks, Seq("user_id"),
          timeCol = "ts", tiebreakCol = "click_id", rightCols = Seq("click_id", "click_ts"))
        .select(col("user_id"), col("purchase_id"),
          col("right_click_id").as("click_id"),
          (graft.operators.Events.epochMicros(col("ts")) -
            graft.operators.Events.epochMicros(col("right_click_ts"))).as("gap_us"))
        .orderBy("purchase_id")
    },
    Some("""WITH p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
                       WHERE event_type = 'purchase'),
                 c0 AS (SELECT user_id, ts, event_id AS click_id FROM events
                        WHERE event_type = 'click'),
                 c AS (SELECT user_id, ts, max(click_id) AS click_id FROM c0 GROUP BY 1, 2)
            SELECT p.user_id, p.purchase_id, c.click_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY purchase_id"""),
  )

  /** ClickHouse `ASOF LEFT JOIN` SQL text verbatim: ChSqlParser
    * rewrites it (round 12) to the SAME union+window shape as
    * [[graft.operators.AsofJoin]] (q93) — right rows and distinct
    * probe markers through one key-partitioned window, then an
    * equi-join back to the probe table. No inequality reaches a join
    * condition, so the verbatim SQL spelling is now scale-safe and
    * this entry runs UNBOUNDED over the full events table (the
    * round-5 LATERAL+LIMIT 1 form planned a nested-loop domain join
    * and had to anchor both sides to a bounded key slice). The click
    * side is deduped per (user, ts) first — ties at equal timestamps
    * are CH-unspecified, the dedupe makes both engines deterministic
    * (q93's oracle convention). */
  val q93b = GraftQuery(
    "q93b_asof_sql",
    (s, dir) => {
      val e = Tables(s, dir).events
      e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
        .createOrReplaceTempView("purch_aj")
      e.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
        .createOrReplaceTempView("clicks_aj")
      s.sql("""SELECT p.user_id, p.purchase_id, c.click_id
               FROM purch_aj p ASOF LEFT JOIN clicks_aj c
               ON p.user_id = c.user_id AND p.ts >= c.ts
               ORDER BY p.purchase_id""")
    },
    Some("""WITH p AS (SELECT user_id, ts, event_id AS purchase_id FROM events
                       WHERE event_type = 'purchase'),
                 c0 AS (SELECT user_id, ts, event_id AS click_id FROM events
                        WHERE event_type = 'click'),
                 c AS (SELECT user_id, ts, max(click_id) AS click_id FROM c0 GROUP BY 1, 2)
            SELECT p.user_id, p.purchase_id, c.click_id
            FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY purchase_id"""),
  )

  /** JSONExtract family over the semi-structured props column. */
  val q94 = GraftQuery(
    "q94_json_extract",
    (s, dir) => Tables(s, dir).events
      .select(col("event_type"), ch.jsonExtractInt(col("props"), "$.k").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("cnt"),
           round(avg(col("k")), 4).as("avg_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(CAST(props ->> '$.k' AS BIGINT)) AS cnt,
                   round(avg(CAST(props ->> '$.k' AS BIGINT)), 4) AS avg_k,
                   max(CAST(props ->> '$.k' AS BIGINT)) AS max_k
            FROM events GROUP BY 1 ORDER BY event_type"""),
  )

  /** The JSONExtract* long tail in CH spelling: JSONHas/isValidJSON,
    * typed extraction (Int/Float/Bool/String), multi-part paths with
    * 1-based array indices (`JSONExtractString(j, 'tags', 1)`),
    * JSONExtractRaw/Keys, JSONLength (array length / object key
    * count) and JSONType classification. The JSON is synthesized from
    * lineitem columns so the oracle knows every expected value without
    * parsing anything. */
  val q94b = GraftQuery(
    "q94b_json_gauntlet",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_js")
      s.sql("""SELECT l_orderkey, l_linenumber,
                      CAST(JSONHas(j, 'qty') AS INT) AS has_qty,
                      CAST(JSONHas(j, 'zz') AS INT) AS has_zz,
                      CAST(JSONExtractInt(j, 'id') AS BIGINT) AS jid,
                      round(JSONExtractFloat(j, 'qty'), 2) AS jqty,
                      CAST(JSONExtractBool(j, 'ok') AS INT) AS jok,
                      JSONExtractString(j, 'tags', 1) AS tag1,
                      CAST(JSONExtractInt(j, 'meta', 'ln') AS BIGINT) AS jln,
                      CAST(JSONLength(JSONExtractRaw(j, 'tags')) AS INT) AS tlen,
                      CAST(JSONLength(j) AS INT) AS olen,
                      arrayStringConcat(JSONExtractKeys(j), ',') AS jkeys,
                      CAST(isValidJSON(j) AS INT) AS v1,
                      CAST(isValidJSON('{"broken":') AS INT) AS v0,
                      JSONType(j) AS t_obj,
                      JSONType(JSONExtractRaw(j, 'tags')) AS t_arr,
                      JSONType(JSONExtractRaw(j, 'qty')) AS t_num,
                      JSONType(JSONExtractRaw(j, 'ok')) AS t_bool
               FROM (SELECT l_orderkey, l_linenumber,
                            concat('{"id": ', CAST(l_orderkey AS STRING),
                                   ', "qty": ', CAST(l_quantity AS STRING),
                                   ', "tags": ["', l_returnflag, '", "x"]',
                                   ', "meta": {"ln": ', CAST(l_linenumber AS STRING), '}',
                                   ', "ok": true}') AS j
                     FROM lineitem_js WHERE l_orderkey <= 300) t
               ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   1 AS has_qty, 0 AS has_zz,
                   l_orderkey AS jid,
                   round(l_quantity, 2) AS jqty,
                   1 AS jok,
                   l_returnflag AS tag1,
                   CAST(l_linenumber AS BIGINT) AS jln,
                   2 AS tlen, 5 AS olen,
                   'id,qty,tags,meta,ok' AS jkeys,
                   1 AS v1, 0 AS v0,
                   'Object' AS t_obj, 'Array' AS t_arr,
                   'Double' AS t_num, 'Bool' AS t_bool
            FROM lineitem WHERE l_orderkey <= 300
            ORDER BY l_orderkey, l_linenumber"""),
  )

  /** ORDER BY … WITH FILL analog: zero-filled daily series over the
    * observed range (spine from sequence(), left join, coalesce). */
  val q95 = GraftQuery(
    "q95_gap_fill",
    (s, dir) => {
      val e = Tables(s, dir).events
      // round-18 vacuity audit: value > 480 matched ZERO events at
      // every SF (the q95h class) — every spine day filled 0 and the
      // join's real-day branch never ran. 200 keeps 21 of 30 days
      // real and 9 filled at the gate SF.
      val daily = e.where(col("event_type") === "purchase" && col("value") > 200)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val spine = e
        .agg(min(date_trunc("day", col("ts"))).as("lo"),
             max(date_trunc("day", col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("day")
    },
    Some("""WITH b AS (SELECT min(date_trunc('day', ts)) AS lo,
                              max(date_trunc('day', ts)) AS hi FROM events),
                 spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
                 d AS (SELECT date_trunc('day', ts) AS day, count(*) AS cnt FROM events
                       WHERE event_type = 'purchase' AND value > 200 GROUP BY 1)
            SELECT spine.day, coalesce(d.cnt, 0) AS cnt
            FROM spine LEFT JOIN d USING (day) ORDER BY day"""),
  )

  /** `ORDER BY … WITH FILL FROM … TO … STEP …` VERBATIM (ChSqlParser
    * rewrite): integer-grid axis FULL OUTER JOINed under the query, so
    * missing grid days appear zero-filled and off-grid rows survive —
    * ClickHouse's fill semantics (TO exclusive). q95 keeps the
    * DataFrame-combinator analog; this is the migrated-SQL spelling. */
  val q95b = GraftQuery(
    "q95b_with_fill",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_wf")
      s.sql("""SELECT datediff(CAST(ts AS DATE), DATE '1995-01-01') AS d, count(*) AS cnt
               FROM events_wf WHERE event_type = 'purchase' AND value > 200
               GROUP BY datediff(CAST(ts AS DATE), DATE '1995-01-01')
               ORDER BY d WITH FILL FROM 0 TO 60""")
    },
    Some("""WITH d AS (SELECT date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS d,
                              count(*) AS cnt
                       FROM events WHERE event_type = 'purchase' AND value > 200 GROUP BY 1),
                 axis AS (SELECT range AS g FROM range(0, 60))
            SELECT CAST(coalesce(d.d, axis.g) AS INT) AS d, coalesce(cnt, 0) AS cnt
            FROM axis FULL OUTER JOIN d ON d.d = axis.g
            ORDER BY d"""),
  )

  /** `WITH FILL … INTERPOLATE` AS-expressions (round 15): the carry
    * form `cnt AS cnt` and the affine recurrence `peak AS peak - 3` —
    * CH's running-counter spelling, where each filled row applies the
    * step to the PREVIOUS row's value so a gap ramps down from the
    * last observed peak. The oracle replays the recurrence from first
    * principles in DuckDB: source-row groups via a running count,
    * rows-since-source via row_number, last-source value via
    * last_value IGNORE NULLS. */
  val q95c = GraftQuery(
    "q95c_fill_interpolate",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_wfi")
      s.sql("""SELECT datediff(CAST(ts AS DATE), DATE '1995-01-01') AS d, count(*) AS cnt,
                      CAST(max(value) AS BIGINT) AS peak
               FROM events_wfi WHERE event_type = 'purchase' AND value > 200
               GROUP BY datediff(CAST(ts AS DATE), DATE '1995-01-01')
               ORDER BY d WITH FILL FROM 0 TO 60 INTERPOLATE (cnt AS cnt, peak AS peak - 3)""")
    },
    Some("""WITH d AS (SELECT date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS d,
                              count(*) AS cnt,
                              -- floor, not bare CAST: DuckDB's double→bigint
                              -- cast ROUNDS where Spark (and CH toInt64)
                              -- truncate — masked while the filter matched
                              -- zero rows, exposed by the round-18 re-seed
                              CAST(floor(max(value)) AS BIGINT) AS peak
                       FROM events WHERE event_type = 'purchase' AND value > 200 GROUP BY 1),
                 axis AS (SELECT range AS g FROM range(0, 60)),
                 j AS (SELECT CAST(coalesce(d.d, axis.g) AS INT) AS d, d.cnt AS cnt,
                              d.peak AS peak, (d.d IS NOT NULL) AS is_src
                       FROM axis FULL OUTER JOIN d ON d.d = axis.g),
                 g AS (SELECT *, count(CASE WHEN is_src THEN 1 END)
                                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                       FROM j)
            SELECT d,
                   coalesce(last_value(cnt IGNORE NULLS)
                     OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cnt,
                   CASE WHEN is_src THEN peak
                        ELSE coalesce(last_value(peak IGNORE NULLS)
                               OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                               - 3 * (row_number() OVER (PARTITION BY grp ORDER BY d) - 1), 0)
                   END AS peak
            FROM g ORDER BY d"""),
  )

  /** Date-axis `WITH FILL … STEP INTERVAL 1 MONTH` VERBATIM (round
    * 16, the round-15 verdict's top item): the gap-filled monthly
    * rollup a migrating user writes right after q03_monthly. The axis
    * generates with Spark's native sequence(date, date, interval) —
    * TRUE calendar month arithmetic, never a 30-day approximation —
    * TO exclusive, and INTERPOLATE composes with the date axis (carry
    * `cnt AS cnt` + affine `peak AS peak - 100`). At sf0.01 months
    * 1995-07 and 1996-09 are empty under the filter (the fill
    * engages) and post-TO months survive off-grid, exactly CH's
    * semantics. Oracle replays the month grid with DuckDB
    * generate_series + the same recurrence. */
  val q95d = GraftQuery(
    "q95d_fill_date_axis",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_wfd")
      s.sql("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS cnt,
                      CAST(round(max(o_totalprice)) AS BIGINT) AS peak
               FROM orders_wfd WHERE o_totalprice > 495000
               GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ORDER BY month WITH FILL FROM toDate('1995-01-01') TO toDate('1997-01-01')
                 STEP INTERVAL 1 MONTH INTERPOLATE (cnt AS cnt, peak AS peak - 100)""")
    },
    Some("""WITH d AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                              count(*) AS cnt, CAST(round(max(o_totalprice)) AS BIGINT) AS peak
                       FROM orders WHERE o_totalprice > 495000 GROUP BY 1),
                 axis AS (SELECT CAST(gs AS DATE) AS g
                          FROM generate_series(DATE '1995-01-01', DATE '1997-01-01', INTERVAL 1 MONTH) t(gs)
                          WHERE gs < DATE '1997-01-01'),
                 j AS (SELECT coalesce(d.month, axis.g) AS month, d.cnt AS cnt, d.peak AS peak,
                              (d.month IS NOT NULL) AS is_src
                       FROM axis FULL OUTER JOIN d ON d.month = axis.g),
                 g AS (SELECT *, count(CASE WHEN is_src THEN 1 END)
                                   OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                       FROM j)
            SELECT month,
                   coalesce(last_value(cnt IGNORE NULLS)
                     OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cnt,
                   CASE WHEN is_src THEN peak
                        ELSE coalesce(last_value(peak IGNORE NULLS)
                               OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                               - 100 * (row_number() OVER (PARTITION BY grp ORDER BY month) - 1), 0)
                   END AS peak
            FROM g ORDER BY month"""),
  )

  /** BOUND-LESS `WITH FILL STEP INTERVAL 1 MONTH` (round 16): no
    * FROM/TO — the axis derives from the result's own min/max month
    * (max inclusive: it is an existing row), CH's most common
    * dashboard spelling. Same filter as q95d so months 1995-07 and
    * 1996-09 (and more across the full range) fill at sf0.01; the
    * oracle replays the min/max month grid with generate_series. */
  val q95e = GraftQuery(
    "q95e_fill_boundless",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_wfb")
      s.sql("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS cnt
               FROM orders_wfb WHERE o_totalprice > 495000
               GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ORDER BY month WITH FILL STEP INTERVAL 1 MONTH""")
    },
    Some("""WITH d AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                              count(*) AS cnt
                       FROM orders WHERE o_totalprice > 495000 GROUP BY 1),
                 b AS (SELECT CAST(min(month) AS TIMESTAMP) AS mn,
                              CAST(max(month) AS TIMESTAMP) AS mx FROM d),
                 axis AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS g
                          FROM b)
            SELECT coalesce(d.month, axis.g) AS month, coalesce(d.cnt, 0) AS cnt
            FROM axis FULL OUTER JOIN d ON d.month = axis.g
            ORDER BY month"""),
  )

  /** HALF-BOUNDED `WITH FILL FROM a STEP INTERVAL 1 MONTH` (round
    * 16): TO omitted — the upper bound derives from the result's own
    * max month (INCLUSIVE: it is an existing row), CH's to-omitted
    * convention; `WITH FILL TO b` symmetrically derives FROM from the
    * min (spec-pinned in Round16FillSpec). The literal bound fixes
    * the axis kind, and months before FROM survive off-grid (CH
    * keeps out-of-range source rows — the 1995 months here). Oracle
    * replays the FROM→max grid with generate_series. */
  val q95f = GraftQuery(
    "q95f_fill_half_bounded",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_wfh")
      s.sql("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS cnt
               FROM orders_wfh WHERE o_totalprice > 495000
               GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
               ORDER BY month WITH FILL FROM toDate('1996-01-01') STEP INTERVAL 1 MONTH""")
    },
    Some("""WITH d AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                              count(*) AS cnt
                       FROM orders WHERE o_totalprice > 495000 GROUP BY 1),
                 b AS (SELECT CAST(max(month) AS TIMESTAMP) AS mx FROM d),
                 axis AS (SELECT CAST(unnest(generate_series(TIMESTAMP '1996-01-01 00:00:00', mx, INTERVAL 1 MONTH)) AS DATE) AS g
                          FROM b WHERE mx >= TIMESTAMP '1996-01-01 00:00:00')
            SELECT coalesce(d.month, axis.g) AS month, coalesce(d.cnt, 0) AS cnt
            FROM axis FULL OUTER JOIN d ON d.month = axis.g
            ORDER BY month"""),
  )

  /** GROUPED `ORDER BY prio, month WITH FILL` (round 16): the fill
    * column is the LAST sort key and the fill restarts per distinct
    * value of the preceding keys — CH's per-category dashboard
    * series. Bound-less here, so each priority class fills its OWN
    * min→max month range (per-group sequence(), one aggregate + one
    * join — no per-group driver loop). Oracle replays the per-group
    * grid with a GROUP BY + generate_series FULL OUTER JOIN. */
  val q95g = GraftQuery(
    "q95g_fill_grouped",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_wfg")
      s.sql("""SELECT o_orderpriority AS prio, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                      count(*) AS cnt
               FROM orders_wfg WHERE o_totalprice > 490000
               GROUP BY o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE)
               ORDER BY prio, month WITH FILL STEP INTERVAL 1 MONTH""")
    },
    Some("""WITH d AS (SELECT o_orderpriority AS prio,
                              CAST(date_trunc('month', o_orderdate) AS DATE) AS month, count(*) AS cnt
                       FROM orders WHERE o_totalprice > 490000 GROUP BY 1, 2),
                 b AS (SELECT prio, CAST(min(month) AS TIMESTAMP) AS mn,
                              CAST(max(month) AS TIMESTAMP) AS mx FROM d GROUP BY prio),
                 axis AS (SELECT prio, CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS g
                          FROM b)
            SELECT coalesce(d.prio, axis.prio) AS prio, coalesce(d.month, axis.g) AS month,
                   coalesce(d.cnt, 0) AS cnt
            FROM axis FULL OUTER JOIN d ON d.prio = axis.prio AND d.month = axis.g
            ORDER BY prio, month"""),
  )

  /** `WITH FILL STALENESS k` (round 16, CH 24.10+): instead of
    * bridging every gap to the next source row, each source day
    * spawns a bounded trailing run — fill while < min(day+k, next
    * source day), the last day running to day+k exclusive — CH's
    * sensor-series shape where an outage longer than k stays a hole.
    * Composes with INTERPOLATE (mx carries across the filled run).
    * Oracle replays the per-row runs in DuckDB with lead() +
    * generate_series; STALENESS with FROM/TO (CH rejects) and
    * non-positive k refuse by pass-through (Round16FillSpec). */
  val q95h = GraftQuery(
    "q95h_fill_staleness",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_wfs")
      s.sql("""SELECT datediff(CAST(ts AS DATE), DATE '1995-01-01') AS d, count(*) AS cnt,
                      CAST(round(max(value)) AS BIGINT) AS mx
               FROM events_wfs WHERE event_type = 'purchase' AND value > 240
                 AND day(CAST(ts AS DATE)) NOT BETWEEN 10 AND 16
               GROUP BY datediff(CAST(ts AS DATE), DATE '1995-01-01')
               ORDER BY d WITH FILL STALENESS 5 INTERPOLATE (mx AS mx)""")
    },
    // the round-16 filter (value > 495) matched ZERO events at every
    // SF — a vacuous 0-row gate. value > 240 with a structural 7-day
    // hole (days 10-16) makes the staleness behavior visible at
    // sf0.01: the 9→18 gap exceeds k=5, so runs stop at +4 and the
    // hole STAYS — the exact semantics the operator exists for.
    Some("""WITH d AS (SELECT date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS d,
                              count(*) AS cnt, CAST(round(max(value)) AS BIGINT) AS mx
                       FROM events WHERE event_type = 'purchase' AND value > 240
                         AND day(CAST(ts AS DATE)) NOT BETWEEN 10 AND 16 GROUP BY 1),
                 r AS (SELECT d, lead(d) OVER (ORDER BY d) AS nx FROM d),
                 axis AS (SELECT DISTINCT g FROM
                            (SELECT unnest(generate_series(d + 1, least(d + 5, coalesce(nx, d + 5)) - 1, 1)) AS g
                             FROM r) runs),
                 j AS (SELECT CAST(coalesce(d.d, axis.g) AS INT) AS d, cnt, mx
                       FROM axis FULL OUTER JOIN d ON d.d = axis.g)
            SELECT d, coalesce(cnt, 0) AS cnt,
                   coalesce(last_value(mx IGNORE NULLS)
                     OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mx
            FROM j ORDER BY d"""),
  )

  /** DESC `WITH FILL` (round 16): `ORDER BY d DESC WITH FILL FROM 60
    * TO -1 STEP -1` — CH's latest-first series, TO exclusive
    * DOWNWARD, with INTERPOLATE carrying along the OUTPUT
    * (descending) order so each filled day reads the previous
    * (higher) day's count. Off-grid days above FROM survive and sort
    * first. The oracle replays the descending grid with DuckDB
    * generate_series(…, -1) + the same carry window. */
  val q95i = GraftQuery(
    "q95i_fill_desc",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_wfd2")
      s.sql("""SELECT datediff(CAST(ts AS DATE), DATE '1995-01-01') AS d, count(*) AS cnt
               FROM events_wfd2 WHERE event_type = 'purchase' AND value > 240
               GROUP BY datediff(CAST(ts AS DATE), DATE '1995-01-01')
               ORDER BY d DESC WITH FILL FROM 60 TO -1 STEP -1 INTERPOLATE (cnt AS cnt)""")
    },
    Some("""WITH d AS (SELECT date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS d,
                              count(*) AS cnt
                       FROM events WHERE event_type = 'purchase' AND value > 240 GROUP BY 1),
                 axis AS (SELECT unnest(generate_series(60, 0, -1)) AS g),
                 j AS (SELECT CAST(coalesce(d.d, axis.g) AS INT) AS d, cnt
                       FROM axis FULL OUTER JOIN d ON d.d = axis.g)
            SELECT d, coalesce(last_value(cnt IGNORE NULLS)
                     OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cnt
            FROM j ORDER BY d DESC"""),
  )

  /** -Array aggregate combinators (sumArray/avgArray) + the t-digest
    * parametric quantile, in CH SQL spelling over per-customer arrays
    * built with groupArray. The element aggregation folds per row and
    * sums across rows — never explodes, so it map-side-combines like
    * any Sum. (quantileTDigest is registered too but sketch rank
    * conventions differ across engines on even counts, so the oracled
    * median here uses the exact interpolating quantile; the t-digest
    * path is exactness-pinned in DialectRound3Spec.) */
  val q91b = GraftQuery(
    "q91b_array_aggs",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_aa")
      s.sql("""WITH per_cust AS (
                 SELECT o_custkey, groupArray(round(o_totalprice, 2)) AS prices
                 FROM orders_aa GROUP BY o_custkey)
               SELECT modulo(o_custkey, 10) AS bucket,
                      round(sumArray(prices), 2) AS total,
                      round(avgArray(prices), 4) AS mean_price,
                      round(quantile(0.5)(arraySum(prices)), 4) AS med_cust_total
               FROM per_cust GROUP BY 1 ORDER BY bucket""")
    },
    Some("""WITH per_cust AS (
              SELECT o_custkey, sum(round(o_totalprice, 2)) AS cust_total,
                     count(*) AS n
              FROM orders GROUP BY 1)
            SELECT o_custkey % 10 AS bucket,
                   round(sum(cust_total), 2) AS total,
                   round(sum(cust_total) / sum(n), 4) AS mean_price,
                   round(quantile_cont(cust_total, 0.5), 4) AS med_cust_total
            FROM per_cust GROUP BY 1 ORDER BY bucket"""),
  )

  /** Positional array transforms (arrayCumSum / arrayDifference /
    * arrayEnumerate) + uniqUpTo, over per-order sorted quantity
    * arrays. The oracle rebuilds each transform with window functions
    * — order-by-value makes ties harmless (equal values → identical
    * cumsum/diff regardless of tie order). */
  /** Array long tail: arrayReduce (per-row aggregate-by-name over
    * elements, argMax pairs included), arrayCompact (consecutive-dup
    * collapse), arrayEnumerateUniq (occurrence indexes), resize /
    * push / pop surgery, arrayWithConstant, arrayReverseSort and the
    * end-exclusive range(). Arrays are built from lineitem columns so
    * every expected value is plain CASE arithmetic in the oracle. */
  val q91d = GraftQuery(
    "q91d_array_tail",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_at")
      s.sql("""SELECT l_orderkey, l_linenumber,
                      CAST(arrayReduce('sum', a3) AS DOUBLE) AS r_sum,
                      CAST(arrayReduce('min', a3) AS BIGINT) AS r_min,
                      CAST(arrayReduce('max', a3) AS BIGINT) AS r_max,
                      round(arrayReduce('avg', a3), 4) AS r_avg,
                      CAST(arrayReduce('count', a3) AS BIGINT) AS r_cnt,
                      CAST(arrayReduce('uniqExact', a3) AS INT) AS r_uniq,
                      CAST(arrayReduce('median', a3) AS BIGINT) AS r_med,
                      arrayReduce('argMax', array(l_returnflag, 'zz'), array(q, ln)) AS r_am,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayCompact(a3)), ',') AS compacted,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayEnumerateUniq(a3)), ',') AS occ,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayResize(a3, 4, 0)), ',') AS resized,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayResize(a3, 2)), ',') AS shrunk,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayPushBack(arrayPopFront(a3), 7)), ',') AS surgery,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayWithConstant(2, ln)), ',') AS repeated,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayReverseSort(a3)), ',') AS rsorted,
                      CAST(arrayFold((acc, x) -> acc * 2 + x, a3, CAST(0 AS BIGINT)) AS BIGINT) AS r_fold,
                      CAST(countEqual(a3, q) AS BIGINT) AS c_eq,
                      arrayStringConcat(arrayMap(x -> toString(x), range(3)), ',') AS rng1,
                      arrayStringConcat(arrayMap(x -> toString(x), range(2, 5)), ',') AS rng2,
                      arrayStringConcat(arrayMap(x -> toString(x), range(1, 10, 3)), ',') AS rng3
               FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
                            CAST(l_quantity AS BIGINT) AS q,
                            CAST(l_linenumber AS BIGINT) AS ln,
                            array(CAST(l_quantity AS BIGINT), CAST(l_quantity AS BIGINT),
                                  CAST(l_linenumber AS BIGINT)) AS a3
                     FROM lineitem_at WHERE l_orderkey <= 300) t
               ORDER BY l_orderkey, l_linenumber""")
    },
    Some("""SELECT l_orderkey, l_linenumber,
                   CAST(2 * q + ln AS DOUBLE) AS r_sum,
                   least(q, ln) AS r_min,
                   greatest(q, ln) AS r_max,
                   round((2 * q + ln) / 3.0, 4) AS r_avg,
                   CAST(3 AS BIGINT) AS r_cnt,
                   CASE WHEN q = ln THEN 1 ELSE 2 END AS r_uniq,
                   q AS r_med,
                   CASE WHEN q >= ln THEN l_returnflag ELSE 'zz' END AS r_am,
                   CASE WHEN q = ln THEN CAST(q AS VARCHAR)
                        ELSE concat(CAST(q AS VARCHAR), ',', CAST(ln AS VARCHAR)) END AS compacted,
                   CASE WHEN q = ln THEN '1,2,3' ELSE '1,2,1' END AS occ,
                   concat(CAST(q AS VARCHAR), ',', CAST(q AS VARCHAR), ',', CAST(ln AS VARCHAR), ',0') AS resized,
                   concat(CAST(q AS VARCHAR), ',', CAST(q AS VARCHAR)) AS shrunk,
                   concat(CAST(q AS VARCHAR), ',', CAST(ln AS VARCHAR), ',7') AS surgery,
                   concat(CAST(ln AS VARCHAR), ',', CAST(ln AS VARCHAR)) AS repeated,
                   CASE WHEN q >= ln THEN concat(CAST(q AS VARCHAR), ',', CAST(q AS VARCHAR), ',', CAST(ln AS VARCHAR))
                        ELSE concat(CAST(ln AS VARCHAR), ',', CAST(q AS VARCHAR), ',', CAST(q AS VARCHAR)) END AS rsorted,
                   6 * q + ln AS r_fold,
                   CASE WHEN q = ln THEN CAST(3 AS BIGINT) ELSE CAST(2 AS BIGINT) END AS c_eq,
                   '0,1,2' AS rng1, '2,3,4' AS rng2, '1,4,7' AS rng3
            FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
                         CAST(l_quantity AS BIGINT) AS q,
                         CAST(l_linenumber AS BIGINT) AS ln
                  FROM lineitem WHERE l_orderkey <= 300) t
            ORDER BY l_orderkey, l_linenumber"""),
  )

  val q91c = GraftQuery(
    "q91c_array_transforms",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_at")
      s.sql("""WITH g AS (
                 SELECT l_orderkey,
                        arraySort(groupArray(CAST(l_quantity AS DOUBLE))) AS qs,
                        CAST(uniqUpTo(3)(l_linenumber) AS BIGINT) AS lines_upto3
                 FROM lineitem_at WHERE modulo(l_orderkey, 100) = 0
                 GROUP BY l_orderkey)
               SELECT l_orderkey,
                      arrayStringConcat(arrayMap(x -> toString(round(x, 2)), arrayCumSum(qs)), ',') AS cum,
                      arrayStringConcat(arrayMap(x -> toString(round(x, 2)), arrayDifference(qs)), ',') AS diffs,
                      arrayStringConcat(arrayMap(x -> toString(x), arrayEnumerate(qs)), ',') AS idxs,
                      lines_upto3
               FROM g ORDER BY l_orderkey""")
    },
    Some("""WITH e AS (SELECT l_orderkey, CAST(l_quantity AS DOUBLE) AS q, l_linenumber
                       FROM lineitem WHERE l_orderkey % 100 = 0),
                 w AS (SELECT l_orderkey, q,
                              row_number() OVER (PARTITION BY l_orderkey ORDER BY q) AS rn,
                              round(sum(q) OVER (PARTITION BY l_orderkey ORDER BY q
                                                 ROWS UNBOUNDED PRECEDING), 2) AS cum,
                              round(coalesce(q - lag(q) OVER (PARTITION BY l_orderkey ORDER BY q), 0), 2) AS d
                       FROM e),
                 agg AS (SELECT l_orderkey,
                                string_agg(CAST(cum AS VARCHAR), ',' ORDER BY rn) AS cum,
                                string_agg(CAST(d AS VARCHAR), ',' ORDER BY rn) AS diffs,
                                string_agg(CAST(rn AS VARCHAR), ',' ORDER BY rn) AS idxs
                         FROM w GROUP BY 1),
                 u AS (SELECT l_orderkey,
                              least(count(DISTINCT l_linenumber), 4) AS lines_upto3
                       FROM e GROUP BY 1)
            SELECT agg.l_orderkey, cum, diffs, idxs, CAST(lines_upto3 AS BIGINT) AS lines_upto3
            FROM agg JOIN u USING (l_orderkey) ORDER BY l_orderkey"""),
  )

  /** Partition pruning on the MergeTree-shaped layout: events landed
    * ONCE per sf-dir under PARTITION BY month / ORDER BY (user_id, ts)
    * (`MergeTreeWrite.write`, reused across sessions via the _SUCCESS
    * guard, like q15b's bucketed layout), then a one-month query reads
    * only that month's directory — the scan's PartitionFilters prune
    * everything else, exactly the MergeTree PARTITION-BY promise. The
    * oracle recomputes from the raw table with the same predicate. */
  val q96 = GraftQuery(
    "q96_partition_prune",
    (s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val path = s"/tmp/graft_mergetree/$tag/events_by_month"
      // FixtureClock-bracketed (round 16): the one-time landing is
      // layout cost, not query cost (a cold sf10 tmpdir showed a
      // 22 s serial cell whose isolated re-run was 1.9 s)
      if (!new java.io.File(s"$path/_SUCCESS").exists()) graft.FixtureClock.time {
        graft.sources.MergeTreeWrite.write(
          Tables(s, dir).events, path,
          partitionExprs = Seq("month" -> date_format(col("ts"), "yyyy-MM")),
          orderBy = Seq("user_id", "ts"))
      }
      val landed = s.read.parquet(path)
      val firstMonth = landed.agg(min("month")).head().getString(0)
      landed.where(col("month") === firstMonth)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
        .orderBy(col("user_id"))
    },
    Some("""WITH fm AS (SELECT min(strftime(ts, '%Y-%m')) AS m FROM events)
            SELECT user_id, count(*) AS cnt, round(sum(value), 2) AS total
            FROM events, fm WHERE strftime(ts, '%Y-%m') = fm.m
            GROUP BY 1 ORDER BY user_id"""),
  )

  /** The ARRAY JOIN clause in ClickHouse spelling, with its hallmark
    * zip semantics: two parallel per-order arrays (built positionally
    * aligned by l_linenumber) are unrolled TOGETHER — one output row
    * per position, never a cross product. ChSqlParser rewrites the
    * clause into chained LATERAL VIEWs (posexplode drives positions,
    * further arrays index by position); the DuckDB oracle zips the
    * same arrays with its native multi-unnest. Ties in the final sort
    * produce identical full rows, so the order stays hash-stable. */
  val q97 = GraftQuery(
    "q97_array_join",
    (s, dir) => {
      val arr = array_sort(collect_list(struct(
        col("l_linenumber").as("ln"), col("l_quantity").as("q"),
        col("l_extendedprice").as("p"))))
      Tables(s, dir).lineitem
        .where(col("l_orderkey") % 200 === 0)
        .groupBy(col("l_orderkey"))
        .agg(arr.as("arr"))
        .select(col("l_orderkey"),
          transform(col("arr"), _.getField("q")).as("qtys"),
          transform(col("arr"), _.getField("p")).as("prices"))
        .createOrReplaceTempView("order_arrays")
      s.sql("""SELECT l_orderkey, CAST(q AS DOUBLE) AS qty, round(p, 2) AS price
               FROM order_arrays ARRAY JOIN qtys AS q, prices AS p
               ORDER BY l_orderkey, qty, price""")
    },
    Some("""WITH oa AS (SELECT l_orderkey,
                               list(l_quantity ORDER BY l_linenumber) AS qtys,
                               list(l_extendedprice ORDER BY l_linenumber) AS prices
                        FROM lineitem WHERE l_orderkey % 200 = 0 GROUP BY 1),
                 u AS (SELECT l_orderkey, unnest(qtys) AS q, unnest(prices) AS p FROM oa)
            SELECT l_orderkey, CAST(q AS DOUBLE) AS qty, round(p, 2) AS price
            FROM u ORDER BY l_orderkey, qty, price"""),
  )

  /** ALIAS-LESS `ARRAY JOIN` (round 16) — CH's most common spelling,
    * where the element SHADOWS the array column — driver-gated over
    * deterministic per-order arrays (sequence + arrayMap, so the
    * zip order is content-defined, not collect order). Two bare
    * arrays zip positionally and both names flip from array to
    * scalar; the oracle replays with DuckDB's lockstep unnest. */
  val q97b = GraftQuery(
    "q97b_array_join_bare",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_ajb")
      s.sql("""WITH t AS (SELECT o_orderkey AS k,
                                 sequence(1, CAST(o_orderkey % 4 + 1 AS INT)) AS ns,
                                 arrayMap(x -> x * 10 + o_orderkey % 7, sequence(1, CAST(o_orderkey % 4 + 1 AS INT))) AS ms
                          FROM orders_ajb WHERE o_orderkey <= 400)
               SELECT k, ns, ms FROM t ARRAY JOIN ns, ms
               ORDER BY k, ns""")
    },
    Some("""WITH t AS (SELECT o_orderkey AS k,
                              generate_series(1, CAST(o_orderkey % 4 + 1 AS INT)) AS ns0
                       FROM orders WHERE o_orderkey <= 400),
                 u AS (SELECT k, unnest(ns0) AS ns FROM t)
            SELECT CAST(k AS BIGINT) AS k, CAST(ns AS INT) AS ns,
                   CAST(ns * 10 + k % 7 AS BIGINT) AS ms
            FROM u ORDER BY k, ns"""),
  )

  /** MergeTree projections made executable: lineitem landed once per
    * sf-dir with a base ORDER BY, an alternate shipdate sort layout,
    * and an aggregate projection keyed by (returnflag, linestatus)
    * holding partial count/sum states. The query's GROUP BY routes to
    * the aggregate projection — rows read ∝ group count, not fact
    * count — and the partial states merge to the exact answer the
    * oracle computes from the raw table (TPC-H Q1 shape). */
  val q99 = GraftQuery(
    "q99_projection",
    (s, dir) => {
      val tag  = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"/tmp/graft_proj/$tag/lineitem"
      // cache the layout per sf-dir, but invalidate when the SOURCE
      // parquet is newer than the manifest — a regenerated testdata
      // dir must not silently serve stale projection results
      val srcMTime = {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(dir), s.sparkContext.hadoopConfiguration)
        fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")).getModificationTime
      }
      val fresh = graft.operators.Projections.manifestMTime(s, path).exists(_ >= srcMTime)
      if (!fresh) graft.FixtureClock.time {
        // file count scales with the session's parallelism: pruning
        // granularity is the parquet row-group either way, but the
        // sort tasks must fit their slice (8 files at sf100 means
        // 2.3 GB/task; defaultParallelism-many keeps slices bounded
        // on any cluster shape). externalBase: the base layout IS the
        // source table (CH semantics — projections are stored BESIDE
        // the table, the base is never copied); the round-13 sf100
        // disk crash was the 18 GB base re-land paying for a fallback
        // layout nothing prunes on
        graft.operators.Projections.write(Tables(s, dir).lineitem, path,
          filesPerLayout = math.max(8, s.sparkContext.defaultParallelism),
          externalBase = Some(s"$dir/lineitem.parquet"),
          baseOrder = Seq("l_orderkey"),
          projections = Seq(
            // COLUMN-SUBSET sort layout (round 14): the shipdate
            // order stores only the hot columns a date-range scan
            // reads — at sf100 the full-row copy was the reason this
            // fixture outgrew the disk envelope (2× table footprint);
            // the subset is ~1/4 of the row bytes (no l_comment)
            graft.operators.Projections.Sort("by_shipdate", Seq("l_shipdate"),
              Seq("l_shipdate", "l_orderkey", "l_quantity", "l_extendedprice", "l_discount")),
            graft.operators.Projections.Agg("by_flag_status",
              Seq("l_returnflag", "l_linestatus"),
              Seq(("cnt", "count", ""),
                  ("sum_qty", "sum", "l_quantity"),
                  ("sum_price", "sum", "l_extendedprice")))))
      }
      val (_, name) = graft.operators.Projections.route(s, path,
        groupByCols = Seq("l_returnflag", "l_linestatus"))
      require(name == "by_flag_status", s"expected the agg projection, routed to $name")
      graft.operators.Projections.mergeAgg(s, path, name)
        .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
                round(col("sum_qty"), 2).as("sum_qty"),
                round(col("sum_price"), 2).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""),
  )

  /** Array long tail: groupArrayIntersect (generic shrinking
    * set-intersection aggregate, [[graft.plans.GraftArrayIntersectAgg]]),
    * arrayPartialSort / arrayPartialReverseSort (full sorts — the
    * deterministic conforming reading of CH's "first n sorted, rest
    * unspecified"), and the seeded deterministic arrayShuffle /
    * arrayRandomSample (xxhash-keyed permutation — reproducible
    * across engines, so the oracle can check the permutation and
    * subset INVARIANTS even though no SQL engine replays the hash).
    * The intersection oracle rebuilds membership counts per element
    * over the distinct per-group arrays. */
  val q91e = GraftQuery(
    "q91e_array_sets",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_at")
      s.sql("""WITH g AS (SELECT l_returnflag AS rf,
                                 sequence(CAST(l_linenumber % 3 AS BIGINT),
                                          CAST(l_linenumber % 3 AS BIGINT) + 3) AS a
                          FROM lineitem_at)
               SELECT rf,
                      arrayStringConcat(arrayMap(x -> toString(x), groupArrayIntersect(a)), ',') AS common,
                      arrayStringConcat(arrayMap(x -> toString(x),
                        arrayPartialSort(3, arrayReverse(CAST(sequence(1, 5) AS ARRAY<BIGINT>)))), ',') AS ps,
                      arrayStringConcat(arrayMap(x -> toString(x),
                        arrayPartialReverseSort(2, CAST(sequence(1, 4) AS ARRAY<BIGINT>))), ',') AS prs,
                      arrayStringConcat(arrayMap(x -> toString(x),
                        arraySort(arrayShuffle(CAST(sequence(1, 8) AS ARRAY<BIGINT>), 7))), ',') AS shuf_sorted,
                      size(arrayRandomSample(sequence(1, 8), 3)) AS sample_n
               FROM g GROUP BY rf ORDER BY rf""")
    },
    Some("""WITH d AS (SELECT DISTINCT l_returnflag AS rf, l_linenumber % 3 AS b FROM lineitem),
                 e AS (SELECT rf, b, unnest(generate_series(b, b + 3)) AS x FROM d),
                 tot AS (SELECT rf, count(*) AS nb FROM d GROUP BY rf),
                 c1 AS (SELECT rf, x, count(*) AS c FROM e GROUP BY rf, x),
                 com AS (SELECT c1.rf, list_sort(list(c1.x)) AS common
                         FROM c1 JOIN tot ON c1.rf = tot.rf
                         WHERE c1.c = tot.nb GROUP BY c1.rf)
            SELECT rf, array_to_string(common, ',') AS common,
                   array_to_string(generate_series(1, 5), ',') AS ps,
                   array_to_string(list_sort(generate_series(1, 4), 'DESC'), ',') AS prs,
                   array_to_string(generate_series(1, 8), ',') AS shuf_sorted,
                   3 AS sample_n
            FROM com ORDER BY rf"""),
  )

  /** Projection DDL + automatic use (round 10): verbatim `ALTER TABLE
    * … ADD PROJECTION (SELECT … GROUP BY …)` materializes aggregate
    * states beside the table, and the [[graft.plans.ProjectionAutoUse]]
    * optimizer rule transparently rewrites the matching GROUP BY to
    * merge those states — rows read ∝ groups, not base rows (CH's
    * transparent-projection read path; a content fingerprint guards
    * staleness, spec-pinned in ChDdlSpec). The oracle replays the
    * aggregation from the raw table — identical results are the whole
    * point of a transparent rewrite. */
  val q99b = GraftQuery(
    "q99b_projection_ddl",
    (s, dir) => {
      graft.FixtureClock.time {
        s.sql("DROP TABLE IF EXISTS gq99b")
        val whRoot = new org.apache.hadoop.fs.Path(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
        val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
        // the table dir AND its sibling projection-data dirs from prior runs
        fs.globStatus(new org.apache.hadoop.fs.Path(whRoot, "gq99b*"))
          .foreach(st => fs.delete(st.getPath, true))
        s.sql("""CREATE TABLE gq99b (id UInt64, prio String, total Float64)
                 ENGINE = MergeTree ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq99b_src")
        s.sql("""INSERT INTO gq99b SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM gq99b_src""")
      }
      // the projection layout build is one-time fixture work (round
      // 16: at sf100 it rewrites 150M rows and was dominating the
      // timed cell as if the ROUTED query cost 30 s) — bracket it so
      // the bench cell tracks the plan, not the build
      graft.FixtureClock.time {
        s.sql("""ALTER TABLE gq99b ADD PROJECTION by_prio
                 (SELECT prio, count(), sum(total), min(total), max(total) GROUP BY prio)""")
      }
      val out = s.sql("""SELECT prio, count(*) AS cnt, round(sum(total), 2) AS total,
                                round(min(total), 2) AS lo, round(max(total), 2) AS hi
                         FROM gq99b GROUP BY prio ORDER BY prio""")
      // the rewrite must actually fire — a silent fallback would make
      // this a plain GROUP BY and the gate would prove nothing
      require(out.queryExecution.executedPlan.toString.contains("_graft_proj_by_prio"),
        "projection auto-use did not engage")
      out
    },
    Some("""SELECT o_orderpriority AS prio, count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS total,
                   round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
            FROM orders GROUP BY 1 ORDER BY prio"""),
  )

  /** Sort-order projection DDL EXECUTING with transparent auto-use
    * (round 11): `ADD PROJECTION p (SELECT * ORDER BY k)` lands the
    * same rows range-partitioned + sorted on `k` in a sibling layout;
    * [[graft.plans.SortProjectionUse]] swaps any leading-key
    * equality/range filter onto it while the content fingerprint
    * holds — parquet row-group min/max pruning standing in for
    * MergeTree's sparse primary index on the projection's ORDER BY.
    * The gate REQUIRES the rewrite to engage (plan-asserted); the
    * oracle answers the same filter from the raw table (rows are
    * identical by construction — only the scanned layout differs). */
  val q99c = GraftQuery(
    "q99c_sort_projection",
    (s, dir) => {
      graft.FixtureClock.time {
        s.sql("DROP TABLE IF EXISTS gq99c")
        val whRoot = new org.apache.hadoop.fs.Path(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
        val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.globStatus(new org.apache.hadoop.fs.Path(whRoot, "gq99c*"))
          .foreach(st => fs.delete(st.getPath, true))
        s.sql("""CREATE TABLE gq99c (id UInt64, prio String, total Float64)
                 ENGINE = MergeTree ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq99c_src")
        s.sql("""INSERT INTO gq99c SELECT o_orderkey, o_orderpriority, o_totalprice
                 FROM gq99c_src""")
      }
      // layout build = fixture work (see q99b's round-16 note)
      graft.FixtureClock.time {
        s.sql("ALTER TABLE gq99c ADD PROJECTION by_prio (SELECT * ORDER BY prio)")
      }
      val out = s.sql("""SELECT id, round(total, 2) AS total
                         FROM gq99c WHERE prio = '1-URGENT' ORDER BY id""")
      require(out.queryExecution.executedPlan.toString.contains("_graft_proj_by_prio"),
        "sort-projection auto-use did not engage")
      out
    },
    Some("""SELECT o_orderkey AS id, round(o_totalprice, 2) AS total
            FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY id"""),
  )

  /** COLUMN-SUBSET sort projection (round 14 — the round-13 verdict's
    * top item): `ADD PROJECTION p (SELECT a, b ORDER BY b)` stores
    * only the listed columns in the alternate sort order (ClickHouse
    * projections can store subsets), and
    * [[graft.plans.SortProjectionUse]] engages only when every column
    * the query touches fits the subset. The gate REQUIRES engagement
    * on a covered query AND base fallback on one that reads an
    * uncovered column — at 100 TB the subset is the difference
    * between "a second sort order costs a few hot columns" and "it
    * doubles the table footprint" (the measured reason q99 was the
    * one sf100 non-runner in round 13). The oracle answers both
    * shapes from the raw table: identical rows are the point of a
    * transparent layout swap. */
  val q99d = GraftQuery(
    "q99d_subset_projection",
    (s, dir) => {
      graft.FixtureClock.time {
        s.sql("DROP TABLE IF EXISTS gq99d")
        val whRoot = new org.apache.hadoop.fs.Path(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
        val fs = whRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.globStatus(new org.apache.hadoop.fs.Path(whRoot, "gq99d*"))
          .foreach(st => fs.delete(st.getPath, true))
        s.sql("""CREATE TABLE gq99d (id UInt64, prio String, total Float64, odate Date)
                 ENGINE = MergeTree ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq99d_src")
        s.sql("""INSERT INTO gq99d
                 SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderdate
                 FROM gq99d_src""")
      }
      // layout build + layout ASSERTS = fixture work (see q99b's
      // round-16 note); the plan asserts below stay timed — they
      // inspect the executed plan, not the data
      graft.FixtureClock.time {
        s.sql("ALTER TABLE gq99d ADD PROJECTION by_prio (SELECT prio, id, total ORDER BY prio)")
        // the landed layout must hold ONLY the subset columns
        val info = s.sql("DESCRIBE TABLE EXTENDED gq99d").collect()
          .find(_.getString(0) == "Location").map(_.getString(1)).get
        val storedCols = s.read.parquet(info + "__graft_proj_by_prio").schema.fieldNames.toSet
        require(storedCols == Set("prio", "id", "total"),
          s"subset layout stored $storedCols")
      }
      // covered query → subset layout (plan-asserted)
      val out = s.sql("""SELECT id, round(total, 2) AS total
                         FROM gq99d WHERE prio = '1-URGENT' ORDER BY id""")
      require(out.queryExecution.executedPlan.toString.contains("_graft_proj_by_prio"),
        "subset sort-projection auto-use did not engage")
      // uncovered query (reads `odate`) → base scan, never the subset
      val uncovered = s.sql("SELECT id, odate FROM gq99d WHERE prio = '1-URGENT'")
      require(!uncovered.queryExecution.executedPlan.toString.contains("_graft_proj_by_prio"),
        "a query outside the subset must not read the subset layout")
      out
    },
    Some("""SELECT o_orderkey AS id, round(o_totalprice, 2) AS total
            FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY id"""),
  )

  /** MULTI-KEY `ORDER BY a WITH FILL, b WITH FILL` (round 17 — the
    * last WITH FILL spelling; the round-16 descope deleted). NOT a
    * cartesian grid: ClickHouse's own docs example shows the first
    * key filling over its range with the second key taking the type
    * default, and the second key filling only within runs of equal
    * first-key values. Executes as the composition of two grouped
    * single-key fills (ChSqlParser.rewriteMultiFill); the oracle
    * replays the same nested semantics in DuckDB — per-month
    * generate_series for the inner axis, a global generate_series
    * for the outer with b defaulted to 0. */
  val q95j = GraftQuery(
    "q95j_fill_multikey",
    (s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_mkf")
      s.sql("""SELECT m, b, round(sum(o_totalprice), 0) AS v
               FROM (SELECT month(o_orderdate) AS m,
                            CAST(floor(day(o_orderdate) / 9) AS INT) AS b, o_totalprice
                     FROM orders_mkf
                     WHERE year(o_orderdate) = 1995 AND month(o_orderdate) IN (2, 5, 6)
                       AND day(o_orderdate) IN (2, 3, 25, 26))
               GROUP BY m, b
               ORDER BY m WITH FILL, b WITH FILL""")
    },
    Some("""WITH src AS (
              SELECT month(o_orderdate) AS m,
                     CAST(floor(day(o_orderdate) / 9) AS INT) AS b,
                     round(sum(o_totalprice), 0) AS v
              FROM orders
              WHERE year(o_orderdate) = 1995 AND month(o_orderdate) IN (2, 5, 6)
                AND day(o_orderdate) IN (2, 3, 25, 26)
              GROUP BY 1, 2),
            axis2 AS (
              SELECT m, unnest(generate_series(mn, mx)) AS b
              FROM (SELECT m, min(b) AS mn, max(b) AS mx FROM src GROUP BY m)),
            inner_fill AS (
              SELECT m, b, v FROM src
              UNION ALL
              SELECT a.m, a.b, 0 FROM axis2 a
              WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.m = a.m AND s.b = a.b)),
            axis1 AS (
              SELECT unnest(generate_series((SELECT min(m) FROM src),
                                            (SELECT max(m) FROM src))) AS m)
            SELECT m, b, v FROM inner_fill
            UNION ALL
            SELECT a.m, 0 AS b, 0 AS v FROM axis1 a
            WHERE NOT EXISTS (SELECT 1 FROM inner_fill i WHERE i.m = a.m)
            ORDER BY m, b"""),
  )

  /** Non-affine INTERPOLATE AS-expressions (round 17): the geometric
    * recurrence `c AS c * 2` (each filled row doubles the previous —
    * closed form last · 2ⁿ) and the cross-column recurrence
    * `w AS w + d` (each filled row adds the PREVIOUS row's d — here d
    * is the fill axis itself, so a filled run ramps by the running
    * axis sum). The oracle replays both closed forms over the same
    * grid with DuckDB windows. Forms outside the whitelist (cross-
    * column multiplication, expressions over an interpolated operand)
    * keep refusing — Round17FillSpec. */
  val q95k = GraftQuery(
    "q95k_fill_interpolate_expr",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_nafe")
      s.sql("""SELECT d, cnt, c, w FROM (
                 SELECT day(CAST(ts AS DATE)) AS d, count(*) AS cnt,
                        round(sum(value), 2) AS c, round(max(value), 2) AS w
                 FROM events_nafe WHERE event_type = 'purchase' AND value > 240
                   AND day(CAST(ts AS DATE)) % 7 IN (1, 3)
                 GROUP BY day(CAST(ts AS DATE)))
               ORDER BY d WITH FILL FROM 1 TO 31
               INTERPOLATE (c AS c / 2, w AS w + d)""")
    },
    Some("""WITH src AS (
              SELECT day(CAST(ts AS DATE)) AS d, count(*) AS cnt,
                     round(sum(value), 2) AS c, round(max(value), 2) AS w
              FROM events WHERE event_type = 'purchase' AND value > 240
                AND day(CAST(ts AS DATE)) % 7 IN (1, 3)
              GROUP BY 1),
            axis AS (SELECT unnest(generate_series(1, 30)) AS d),
            j AS (SELECT CAST(coalesce(s.d, a.d) AS INT) AS d,
                         coalesce(s.cnt, 0) AS cnt, s.c AS c, s.w AS w,
                         (s.d IS NOT NULL) AS is_src
                  FROM axis a FULL OUTER JOIN src s ON s.d = a.d),
            g AS (SELECT *,
                         count(CASE WHEN is_src THEN 1 END)
                           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                  FROM j),
            r AS (SELECT *,
                         row_number() OVER (PARTITION BY grp ORDER BY d) - 1 AS n,
                         last_value(c IGNORE NULLS)
                           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc,
                         last_value(w IGNORE NULLS)
                           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lw,
                         sum(d) OVER (PARTITION BY grp ORDER BY d
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sd
                  FROM g)
            SELECT d, cnt,
                   CASE WHEN is_src THEN c ELSE coalesce(lc / power(2, n), 0) END AS c,
                   CASE WHEN is_src THEN w ELSE coalesce(lw + coalesce(sd, 0), 0) END AS w
            FROM r ORDER BY d"""),
  )

  /** STALENESS on a Date axis (round 17): `STEP INTERVAL 1 DAY
    * STALENESS INTERVAL 4 DAY` — per-source-day bounded runs with
    * TRUE calendar stepping (q95d's interval machinery), gaps longer
    * than the staleness left as holes. Same union-of-runs plan as the
    * integer form (fill values never collide with source values —
    * never a join); the `- 1` inclusive-end trick has no calendar
    * equivalent, so runs generate through v + k and a strict `< cap`
    * filter enforces both exclusivities. Oracle: per-row
    * generate_series + the same cap in DuckDB. */
  val q95l = GraftQuery(
    "q95l_fill_staleness_date",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_wfsd")
      s.sql("""SELECT d, cnt FROM (
                 SELECT CAST(ts AS DATE) AS d, count(*) AS cnt
                 FROM events_wfsd WHERE event_type = 'purchase' AND value > 240
                   AND day(CAST(ts AS DATE)) NOT BETWEEN 10 AND 16
                 GROUP BY CAST(ts AS DATE))
               ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 4 DAY""")
    },
    Some("""WITH src AS (
              SELECT CAST(ts AS DATE) AS d, count(*) AS cnt
              FROM events WHERE event_type = 'purchase' AND value > 240
                AND day(CAST(ts AS DATE)) NOT BETWEEN 10 AND 16
              GROUP BY 1),
            r AS (SELECT d, least(d + INTERVAL 4 DAY,
                                  coalesce(lead(d) OVER (ORDER BY d), d + INTERVAL 4 DAY)) AS cap
                  FROM src),
            fills AS (SELECT CAST(unnest(generate_series(CAST(d + INTERVAL 1 DAY AS TIMESTAMP),
                                                         CAST(d + INTERVAL 4 DAY AS TIMESTAMP),
                                                         INTERVAL 1 DAY)) AS DATE) AS d, cap
                      FROM r)
            SELECT d, cnt FROM src
            UNION ALL
            SELECT DISTINCT f.d, 0 FROM fills f WHERE CAST(f.d AS TIMESTAMP) < CAST(f.cap AS TIMESTAMP)
            ORDER BY d"""),
  )

  val all: Seq[GraftQuery] = Seq(q90, q91, q91b, q91c, q91d, q91e, q92, q93, q93b, q94, q94b, q95, q95b, q95c, q95d, q95e, q95f, q95g, q95h, q95i, q95j, q95k, q95l, q96, q97, q97b, q99, q99b, q99c, q99d)
}
