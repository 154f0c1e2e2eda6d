package graft.queries

import graft.GraftQuery
import graft.multimodal.Binary
import graft.operators.Events
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Waves I–J of SURVEY.md §2: ClickHouse-style behavioral analytics
  * over the events stream (sessionization, windowFunnel/retention
  * combinator analogs, histogram, pivot) and the multimodal binary
  * plumbing. All time math is integral microseconds; every query is
  * one shuffle on the user key plus map-side work.
  */
object EventsAnalytics {

  /** 30-minute-gap sessionization → per-session summary. */
  val q70 = GraftQuery(
    "q70_sessionize",
    (s, dir) => Events.sessionize(Tables(s, dir).events, "user_id", "ts", "event_id")
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("sess_start"),
           max(col("ts")).as("sess_end"))
      .orderBy("user_id", "session_idx"),
    Some("""WITH o AS (SELECT user_id, ts, event_id,
                              CASE WHEN lag(ts) OVER w IS NULL
                                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                                   THEN 1 ELSE 0 END AS is_new
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
                 sess AS (SELECT user_id, ts,
                                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                          FROM o)
            SELECT user_id, session_idx, count(*) AS n_events,
                   min(ts) AS sess_start, max(ts) AS sess_end
            FROM sess GROUP BY 1, 2 ORDER BY user_id, session_idx"""),
  )

  /** windowFunnel(7d) signup→click→purchase: users per deepest level. */
  val q71 = GraftQuery(
    "q71_funnel",
    (s, dir) => Events.funnelLevels(Tables(s, dir).events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), windowDays = 7)
      .groupBy("level").agg(count(lit(1)).as("n_users"))
      .orderBy("level"),
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'signup' GROUP BY 1),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2, max(t1) AS t1
                        FROM events e JOIN s1 USING (user_id)
                        WHERE e.event_type = 'click' AND e.ts > t1
                          AND e.ts <= t1 + INTERVAL 7 DAY GROUP BY 1),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t3
                        FROM events e JOIN s2 USING (user_id)
                        WHERE e.event_type = 'purchase' AND e.ts > t2
                          AND e.ts <= t1 + INTERVAL 7 DAY GROUP BY 1)
            SELECT level, count(*) AS n_users FROM (
              SELECT s1.user_id,
                     CASE WHEN s3.user_id IS NOT NULL THEN 3
                          WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS level
              FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)) t
            GROUP BY 1 ORDER BY level"""),
  )

  /** Weekly signup-cohort retention. */
  val q72 = GraftQuery(
    "q72_retention",
    (s, dir) => Events.cohortRetention(Tables(s, dir).events, "user_id", "ts",
        "event_type", cohortEvent = "signup")
      .orderBy("week_offset"),
    Some("""WITH cohort AS (SELECT user_id, min(date_trunc('week', ts)) AS cw
                            FROM events WHERE event_type = 'signup' GROUP BY 1),
                 act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events)
            SELECT CAST(date_diff('day', CAST(cw AS DATE), CAST(aw AS DATE)) / 7 AS INTEGER) AS week_offset,
                   count(DISTINCT user_id) AS n_users
            FROM act JOIN cohort USING (user_id)
            WHERE aw >= cw GROUP BY 1 ORDER BY week_offset"""),
  )

  /** Fixed-grid value histogram: 20 buckets over [0, 500). */
  val q73 = GraftQuery(
    "q73_histogram",
    (s, dir) => Events.histogram(Tables(s, dir).events, "value", 0.0, 500.0, 20)
      .orderBy("bucket"),
    Some("""SELECT CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bucket,
                   count(*) AS cnt,
                   round(CAST(least(floor(value / 25.0), 19) AS BIGINT) * 25.0, 6) AS lo,
                   round((CAST(least(floor(value / 25.0), 19) AS BIGINT) + 1) * 25.0, 6) AS hi
            FROM events GROUP BY 1 ORDER BY bucket"""),
  )

  /** ClickHouse's adaptive `histogram(n)(x)` in its parametric SQL
    * spelling ([[graft.plans.GraftHistogram]]): bounds emerge from
    * greedy closest-center merging instead of a pre-declared grid
    * (q73 is the fixed-grid form). Bin boundaries depend on partial-
    * merge order, exactly like the original — rows-only (SURVEY ⭕);
    * the invariants (bin count, conserved mass, nested bounds) are
    * spec-pinned — and the registry output exposes exactly the
    * deterministic pair (bin count, total mass), which the oracle
    * checks as (12, row count). */
  val q73b = GraftQuery(
    "q73b_adaptive_histogram",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_ah")
      s.sql("""SELECT event_type,
                      CAST(size(h) AS INT) AS n_bins,
                      round(aggregate(h, CAST(0.0 AS DOUBLE), (acc, b) -> acc + b.height), 0) AS mass
               FROM (SELECT event_type, histogram(12)(value) AS h
                     FROM events_ah GROUP BY event_type) t
               ORDER BY event_type""")
    },
    Some("""SELECT event_type, 12 AS n_bins,
                   round(CAST(count(*) AS DOUBLE), 0) AS mass
            FROM events GROUP BY 1 ORDER BY event_type"""),
  )

  /** Per-user event_type pivot counts. */
  val q74 = GraftQuery(
    "q74_pivot",
    (s, dir) => Tables(s, dir).events
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("error"), lit(0L)).as("n_error"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("view"), lit(0L)).as("n_view"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   count(*) FILTER (WHERE event_type = 'error') AS n_error,
                   count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view
            FROM events GROUP BY 1 ORDER BY user_id"""),
  )

  /** `windowFunnel(7d)` in its native parametric SQL spelling (the
    * [[graft.plans.GraftWindowFunnel]] aggregate, strict_increase
    * mode), oracle-checked against an exists-chain formulation: level
    * L is reached iff a strictly-time-increasing cond1→…→condL chain
    * exists whose last event is within the window of its first — the
    * equivalence the aggregate's latest-start DP guarantees. One
    * shuffle of (user, matching-event) pairs; the DuckDB self-joins
    * are oracle-side only. */
  val q75 = GraftQuery(
    "q75_window_funnel",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_seq")
      s.sql("""SELECT CAST(level AS BIGINT) AS level, count(*) AS n_users
               FROM (SELECT user_id,
                            windowFunnel(604800)(ts, event_type = 'signup',
                              event_type = 'click', event_type = 'purchase') AS level
                     FROM events_seq GROUP BY user_id) t
               GROUP BY level ORDER BY level""")
    },
    Some("""WITH l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
                 l2 AS (SELECT DISTINCT a.user_id
                        FROM events a JOIN events b USING (user_id)
                        WHERE a.event_type = 'signup' AND b.event_type = 'click'
                          AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY),
                 l3 AS (SELECT DISTINCT a.user_id
                        FROM events a JOIN events b USING (user_id) JOIN events c USING (user_id)
                        WHERE a.event_type = 'signup' AND b.event_type = 'click'
                          AND c.event_type = 'purchase'
                          AND b.ts > a.ts AND c.ts > b.ts AND c.ts <= a.ts + INTERVAL 7 DAY)
            SELECT CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
                             WHEN l2.user_id IS NOT NULL THEN 2
                             WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS level,
                   count(*) AS n_users
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN l1 ON u.user_id = l1.user_id
            LEFT JOIN l2 ON u.user_id = l2.user_id
            LEFT JOIN l3 ON u.user_id = l3.user_id
            GROUP BY 1 ORDER BY level"""),
  )

  /** windowFunnel's `strict_order` / `strict_dedup` modes
    * ([[graft.plans.GraftWindowFunnel]]): strict_order breaks a
    * started chain on any interleaving event (foreign events retained
    * for exactly this reason), strict_dedup interrupts when a
    * condition whose level is already reached fires again. The oracle
    * REPLAYS the documented one-slot-per-level scan as a recursive
    * CTE over (ts, condIdx)-sorted per-user entries — the same
    * deterministic order the aggregate uses — so the hash-match
    * certifies the scan event by event, not just aggregate totals. */
  val q75b = GraftQuery(
    "q75b_funnel_modes",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_seq")
      s.sql("""SELECT CAST(lo AS BIGINT) AS level_order, CAST(ld AS BIGINT) AS level_dedup,
                      count(*) AS n_users
               FROM (SELECT user_id,
                            windowFunnel(604800, 'strict_order')(ts, event_type = 'signup',
                              event_type = 'click', event_type = 'purchase') AS lo,
                            windowFunnel(604800, 'strict_dedup')(ts, event_type = 'signup',
                              event_type = 'click', event_type = 'purchase') AS ld
                     FROM events_seq GROUP BY user_id) t
               GROUP BY lo, ld ORDER BY level_order, level_dedup""")
    },
    Some("""WITH RECURSIVE
              base AS (SELECT user_id, epoch_us(ts) AS t,
                              CASE event_type WHEN 'signup' THEN 0 WHEN 'click' THEN 1
                                   WHEN 'purchase' THEN 2 ELSE -1 END AS idx
                       FROM events),
              eo AS (SELECT user_id, t, idx,
                            row_number() OVER (PARTITION BY user_id ORDER BY t, idx) AS rn
                     FROM base),
              ed AS (SELECT user_id, t, idx,
                            row_number() OVER (PARTITION BY user_id ORDER BY t, idx) AS rn
                     FROM base WHERE idx >= 0),
              u AS (SELECT DISTINCT user_id FROM events),
              so AS (
                SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS f0, CAST(NULL AS BIGINT) AS p0,
                       CAST(NULL AS BIGINT) AS f1, CAST(NULL AS BIGINT) AS p1,
                       CAST(NULL AS BIGINT) AS f2, false AS stopped, CAST(NULL AS INTEGER) AS forced
                FROM u
                UNION ALL
                SELECT s.user_id, e.rn,
                  CASE WHEN e.idx = 0 THEN e.t ELSE s.f0 END,
                  CASE WHEN e.idx = 0 THEN e.t ELSE s.p0 END,
                  CASE WHEN e.idx = 1 AND s.f0 IS NOT NULL AND e.t - s.f0 <= 604800000000
                            AND s.p0 < e.t THEN s.f0 ELSE s.f1 END,
                  CASE WHEN e.idx = 1 AND s.f0 IS NOT NULL AND e.t - s.f0 <= 604800000000
                            AND s.p0 < e.t THEN e.t ELSE s.p1 END,
                  CASE WHEN e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000
                            AND s.p1 < e.t THEN s.f1 ELSE s.f2 END,
                  (e.idx = -1 AND s.f0 IS NOT NULL)
                    OR (e.idx = 2 AND s.f0 IS NOT NULL AND s.f1 IS NULL)
                    OR (e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000 AND s.p1 < e.t),
                  CASE WHEN e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000
                            AND s.p1 < e.t THEN 3
                       WHEN (e.idx = -1 AND s.f0 IS NOT NULL)
                         OR (e.idx = 2 AND s.f0 IS NOT NULL AND s.f1 IS NULL)
                       THEN CASE WHEN s.f2 IS NOT NULL THEN 3 WHEN s.f1 IS NOT NULL THEN 2
                                 WHEN s.f0 IS NOT NULL THEN 1 ELSE 0 END
                       ELSE NULL END
                FROM so s JOIN eo e ON e.user_id = s.user_id AND e.rn = s.rn + 1
                WHERE NOT s.stopped),
              sd AS (
                SELECT user_id, 0 AS rn, CAST(NULL AS BIGINT) AS f0, CAST(NULL AS BIGINT) AS p0,
                       CAST(NULL AS BIGINT) AS f1, CAST(NULL AS BIGINT) AS p1,
                       CAST(NULL AS BIGINT) AS f2, false AS stopped, CAST(NULL AS INTEGER) AS forced
                FROM u
                UNION ALL
                SELECT s.user_id, e.rn,
                  CASE WHEN e.idx = 0 THEN e.t ELSE s.f0 END,
                  CASE WHEN e.idx = 0 THEN e.t ELSE s.p0 END,
                  CASE WHEN e.idx = 1 AND s.f1 IS NULL AND s.f0 IS NOT NULL
                            AND e.t - s.f0 <= 604800000000 AND s.p0 < e.t THEN s.f0 ELSE s.f1 END,
                  CASE WHEN e.idx = 1 AND s.f1 IS NULL AND s.f0 IS NOT NULL
                            AND e.t - s.f0 <= 604800000000 AND s.p0 < e.t THEN e.t ELSE s.p1 END,
                  CASE WHEN e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000
                            AND s.p1 < e.t THEN s.f1 ELSE s.f2 END,
                  (e.idx = 1 AND s.f1 IS NOT NULL)
                    OR (e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000 AND s.p1 < e.t),
                  CASE WHEN e.idx = 1 AND s.f1 IS NOT NULL THEN 2
                       WHEN e.idx = 2 AND s.f1 IS NOT NULL AND e.t - s.f1 <= 604800000000
                            AND s.p1 < e.t THEN 3
                       ELSE NULL END
                FROM sd s JOIN ed e ON e.user_id = s.user_id AND e.rn = s.rn + 1
                WHERE NOT s.stopped),
              sof AS (SELECT user_id,
                             COALESCE(forced, CASE WHEN f2 IS NOT NULL THEN 3
                               WHEN f1 IS NOT NULL THEN 2 WHEN f0 IS NOT NULL THEN 1 ELSE 0 END) AS lo
                      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
                            FROM so) WHERE rr = 1),
              sdf AS (SELECT user_id,
                             COALESCE(forced, CASE WHEN f2 IS NOT NULL THEN 3
                               WHEN f1 IS NOT NULL THEN 2 WHEN f0 IS NOT NULL THEN 1 ELSE 0 END) AS ld
                      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rr
                            FROM sd) WHERE rr = 1)
            SELECT CAST(lo AS BIGINT) AS level_order, CAST(ld AS BIGINT) AS level_dedup,
                   count(*) AS n_users
            FROM sof JOIN sdf USING (user_id)
            GROUP BY 1, 2 ORDER BY level_order, level_dedup"""),
  )

  /** sequenceMatch's time-bounded gaps `(?t op N)` and strict-next `.`
    * atom ([[graft.plans.GraftSequenceMatch]]). The time-gap legs
    * oracle as exists-chains carrying the bound; the `.` leg replays
    * the (ts, mask)-sorted adjacency with window row numbers. */
  val q77c = GraftQuery(
    "q77c_sequence_time",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_seq")
      s.sql("""SELECT CAST(count_if(m_within) AS BIGINT) AS n_within_day,
                      CAST(count_if(m_over) AS BIGINT) AS n_over_hour,
                      CAST(count_if(m_next) AS BIGINT) AS n_strict_next,
                      count(*) AS n_users
               FROM (SELECT user_id,
                       sequenceMatch('(?1)(?t<=86400)(?2)')(ts,
                         event_type = 'view', event_type = 'purchase') AS m_within,
                       sequenceMatch('(?1)(?t>3600)(?2)')(ts,
                         event_type = 'click', event_type = 'purchase') AS m_over,
                       sequenceMatch('(?1).(?2)')(ts,
                         event_type = 'view', event_type = 'purchase') AS m_next
                     FROM events_seq GROUP BY user_id) t""")
    },
    Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
                 w AS (SELECT DISTINCT a.user_id
                       FROM events a JOIN events b USING (user_id)
                       WHERE a.event_type = 'view' AND b.event_type = 'purchase'
                         AND b.ts > a.ts
                         AND epoch_us(b.ts) - epoch_us(a.ts) <= 86400000000),
                 o AS (SELECT DISTINCT a.user_id
                       FROM events a JOIN events b USING (user_id)
                       WHERE a.event_type = 'click' AND b.event_type = 'purchase'
                         AND b.ts > a.ts
                         AND epoch_us(b.ts) - epoch_us(a.ts) > 3600000000),
                 ord AS (SELECT user_id, ts,
                                CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 ELSE 0 END AS mask,
                                row_number() OVER (PARTITION BY user_id ORDER BY ts,
                                  CASE event_type WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 ELSE 0 END) AS rn
                         FROM events),
                 nx AS (SELECT DISTINCT a.user_id
                        FROM ord a
                        JOIN ord b ON a.user_id = b.user_id AND b.rn = a.rn + 1
                        JOIN ord c ON a.user_id = c.user_id AND c.rn = a.rn + 2
                        WHERE a.mask = 1 AND c.mask = 2 AND b.ts > a.ts AND c.ts > b.ts)
            SELECT CAST(count(w.user_id) AS BIGINT) AS n_within_day,
                   CAST(count(o.user_id) AS BIGINT) AS n_over_hour,
                   CAST(count(nx.user_id) AS BIGINT) AS n_strict_next,
                   count(*) AS n_users
            FROM u LEFT JOIN w USING (user_id) LEFT JOIN o USING (user_id)
                   LEFT JOIN nx USING (user_id)"""),
  )

  /** `retention(cond…)` combinator — per-user flag vector, summed into
    * cohort counts. Pure bool_or composition (no custom state). */
  val q76 = GraftQuery(
    "q76_retention_combinator",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_seq")
      s.sql("""SELECT CAST(sum(element_at(r, 1)) AS BIGINT) AS w_signup,
                      CAST(sum(element_at(r, 2)) AS BIGINT) AS w_click,
                      CAST(sum(element_at(r, 3)) AS BIGINT) AS w_purchase,
                      count(*) AS n_users
               FROM (SELECT user_id, retention(event_type = 'signup',
                       event_type = 'click', event_type = 'purchase') AS r
                     FROM events_seq GROUP BY user_id) t""")
    },
    Some("""SELECT CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS w_signup,
                   CAST(sum(CASE WHEN s AND c THEN 1 ELSE 0 END) AS BIGINT) AS w_click,
                   CAST(sum(CASE WHEN s AND p THEN 1 ELSE 0 END) AS BIGINT) AS w_purchase,
                   count(*) AS n_users
            FROM (SELECT user_id, bool_or(event_type = 'signup') AS s,
                         bool_or(event_type = 'click') AS c,
                         bool_or(event_type = 'purchase') AS p
                  FROM events GROUP BY user_id) t"""),
  )

  /** `sequenceMatch('(?1).*(?2).*(?3)')` — ordered-subsequence match
    * per user; the oracle is the equivalent exists-chain. */
  val q77 = GraftQuery(
    "q77_sequence_match",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_seq")
      s.sql("""SELECT CAST(count_if(m) AS BIGINT) AS n_matched, count(*) AS n_users
               FROM (SELECT user_id, sequenceMatch('(?1).*(?2).*(?3)')(ts,
                       event_type = 'view', event_type = 'click',
                       event_type = 'purchase') AS m
                     FROM events_seq GROUP BY user_id) t""")
    },
    Some("""WITH m AS (SELECT DISTINCT a.user_id
                       FROM events a JOIN events b USING (user_id) JOIN events c USING (user_id)
                       WHERE a.event_type = 'view' AND b.event_type = 'click'
                         AND c.event_type = 'purchase'
                         AND b.ts > a.ts AND c.ts > b.ts)
            SELECT CAST(count(m.user_id) AS BIGINT) AS n_matched, count(*) AS n_users
            FROM (SELECT DISTINCT user_id FROM events) u LEFT JOIN m USING (user_id)"""),
  )

  /** sequenceCount (greedy non-overlapping '(?1).*(?2)' matches) per
    * user. The oracle exploits the greedy structure: for a two-step
    * gap pattern, the count equals the number of click→purchase
    * boundaries in the click/purchase-filtered ordered stream (each
    * counted purchase closes a match and resets the scan; ties can't
    * occur — (user, ts) is unique among these events in the testdata,
    * which the strict_increase DP otherwise resolves). */
  val q77b = GraftQuery(
    "q77b_sequence_count",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_sc")
      s.sql("""SELECT user_id,
                      sequenceCount('(?1).*(?2)')(ts,
                        event_type = 'click', event_type = 'purchase') AS n_chains
               FROM events_sc GROUP BY user_id
               HAVING n_chains > 0 ORDER BY user_id""")
    },
    Some("""WITH f AS (SELECT user_id, ts, event_type FROM events
                       WHERE event_type IN ('click', 'purchase')),
                 l AS (SELECT user_id, event_type,
                              lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                       FROM f)
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase' AND prev = 'click') AS BIGINT) AS n_chains
            FROM l GROUP BY 1
            HAVING count(*) FILTER (WHERE event_type = 'purchase' AND prev = 'click') > 0
            ORDER BY user_id"""),
  )

  /** Binary payload column + typed metadata extraction (multimodal
    * plumbing; payload here is the document text as opaque bytes). */
  val q80 = GraftQuery(
    "q80_binary_meta",
    (s, dir) => Binary.withMeta(
        Tables(s, dir).documents.withColumn("payload", col("text").cast("binary")),
        "payload")
      .select(col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.content_md5").as("content_md5"),
        col("media_meta.magic").as("magic"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5,
                   hex(encode(substring(text, 1, 4))) AS magic
            FROM documents ORDER BY doc_id"""),
  )

  /** REAL image decode through the multimodal plumbing: deterministic
    * synthetic PNGs (pixel pattern fixed, so width/height/frames are
    * exact facts however the encoder serializes them) plus one
    * corrupt payload, decoded per-partition by
    * [[Binary.ImageIoDecoder]] (`javax.imageio`, JDK built-in
    * codecs). Scalar metadata out per §5; oracle = the known
    * dimensions as literals. The corrupt row must degrade to
    * ok = false, never throw. */
  val q80b = GraftQuery(
    "q80b_image_decode",
    (s, dir) => {
      import s.implicits._
      def png(w: Int, h: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, (x * 37 + y * 101) & 0xFFFFFF); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val rows: Seq[(Long, Array[Byte])] = Seq(
        1L -> png(7, 5), 2L -> png(16, 16), 3L -> png(33, 9),
        4L -> Array[Byte](1, 2, 3)) // not an image
      Binary.decodeStage(rows.toDF("id", "payload"), "payload", Binary.ImageIoDecoder)
        .select($"id", $"media_info.width".as("width"), $"media_info.height".as("height"),
                $"media_info.frames".as("frames"), $"media_info.ok".as("ok"))
        .orderBy("id")
    },
    Some("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 7, 5, 1, TRUE),
                                  (2, 16, 16, 1, TRUE),
                                  (3, 33, 9, 1, TRUE),
                                  (4, 0, 0, 0, FALSE))
            AS t(id, width, height, frames, ok) ORDER BY id"""),
  )

  /** REAL audio decode through the multimodal plumbing: deterministic
    * synthetic 16-bit PCM WAVs (integer sample formula, so RMS and
    * zero-crossings are EXACT cross-engine facts — every vᵢ² is an
    * integer below 2⁵³, making the double sum order-independent),
    * written by `javax.sound.sampled` and decoded back by
    * [[Binary.JavaSoundAudio]]; one junk payload must degrade to
    * ok = false, never throw. The oracle REPLAYS the sample formula
    * over generate_series — it recomputes the same RMS/ZC from first
    * principles rather than trusting literals. */
  val q80c = GraftQuery(
    "q80c_audio_decode",
    (s, dir) => {
      import s.implicits._
      def wav(n: Int, rate: Int, a: Int, b: Int): Array[Byte] = {
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = ((i * a + b) % 4096) - 2048
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val rows: Seq[(Long, Array[Byte])] = Seq(
        1L -> wav(800, 16000, 2957, 123),
        2L -> wav(1200, 8000, 1493, 777),
        3L -> wav(64, 44100, 3331, 2048),
        4L -> Array[Byte](9, 9, 9)) // not audio
      Binary.audioDecodeStage(rows.toDF("id", "payload"), "payload")
        .select($"id", $"audio_info.channels".as("channels"),
          $"audio_info.sample_rate".as("sample_rate"),
          $"audio_info.n_samples".as("n_samples"),
          round($"audio_info.rms", 6).as("rms"),
          $"audio_info.zero_crossings".as("zc"),
          $"audio_info.ok".as("ok"))
        .orderBy("id")
    },
    Some("""WITH p(id, n, rate, a, b) AS (VALUES (CAST(1 AS BIGINT), 800, 16000, 2957, 123),
                                                 (2, 1200, 8000, 1493, 777),
                                                 (3, 64, 44100, 3331, 2048)),
                 s AS (SELECT id, n, rate, u.i AS i, ((u.i * a + b) % 4096) - 2048 AS v
                       FROM p, LATERAL unnest(range(0, n)) AS u(i)),
                 s2 AS (SELECT id, n, rate, i, v,
                               lag(v) OVER (PARTITION BY id ORDER BY i) AS pv
                        FROM s),
                 agg AS (SELECT id, CAST(1 AS INT) AS channels, CAST(rate AS INT) AS sample_rate,
                                CAST(n AS INT) AS n_samples,
                                round(sqrt(sum(CAST(v AS DOUBLE) * v) / n) / 32768, 6) AS rms,
                                CAST(count(*) FILTER (WHERE pv IS NOT NULL AND v * pv < 0) AS BIGINT) AS zc,
                                TRUE AS ok
                         FROM s2 GROUP BY id, rate, n)
            SELECT id, channels, sample_rate, n_samples, rms, zc, ok FROM agg
            UNION ALL
            SELECT CAST(4 AS BIGINT), 0, 0, 0, 0.0, 0, FALSE
            ORDER BY id"""),
  )

  /** REAL video decode through the multimodal plumbing: deterministic
    * formula-pixel frames muxed into genuine AVI containers
    * (uncompressed 24-bit DIB — [[graft.multimodal.AviCodec]]), then
    * demuxed back: header probe (width/height/frames/fps), evenly-
    * spaced frame sampling, and an exact integer luminance statistic
    * per sampled frame (Σ 299R+587G+114B — BT.601 ×1000, a BIGINT any
    * engine reproduces bit-for-bit). The oracle REPLAYS the pixel
    * formula over generate_series rather than trusting literals; a
    * junk payload must degrade to ok = false, never throw. */
  val q80d = GraftQuery(
    "q80d_video_decode",
    (s, dir) => {
      import s.implicits._
      def avi(w: Int, h: Int, n: Int, fps: Int): Array[Byte] = {
        val frames = (0 until n).map { t =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = (x * 7 + y * 13 + t * 31) % 256
              val g = (x * 3 + y * 5 + t * 17) % 256
              val b = (x * 11 + y * 2 + t * 23) % 256
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          img
        }
        graft.multimodal.AviCodec.encodeDib(frames, fps)
      }
      val rows: Seq[(Long, Array[Byte])] = Seq(
        1L -> avi(48, 32, 6, 10),
        2L -> avi(24, 20, 9, 25),
        3L -> avi(16, 12, 3, 5),
        4L -> Array[Byte](7, 7, 7)) // not a video
      val df = rows.toDF("id", "payload")
      val base = Binary.videoDecodeStage(df, "payload")
        .select($"id", $"video_info.width".as("width"),
          $"video_info.height".as("height"), $"video_info.frames".as("frames"),
          $"video_info.fps_num".as("fps_num"), $"video_info.ok".as("ok"))
      val framed = Binary.videoFrameStage(df, "payload", 4)
        .select($"id", $"frame_idx", $"lum_sum")
      base.join(framed, Seq("id"), "left")
        .select($"id", $"width", $"height", $"frames", $"fps_num", $"ok",
          coalesce($"frame_idx", lit(-1)).as("frame_idx"),
          coalesce($"lum_sum", lit(0L)).as("lum_sum"))
        .orderBy("id", "frame_idx")
    },
    Some("""WITH v(id, w, h, n, fps) AS (VALUES (CAST(1 AS BIGINT), 48, 32, 6, 10),
                                                (2, 24, 20, 9, 25),
                                                (3, 16, 12, 3, 5)),
                 picks AS (SELECT id, w, h, n, fps,
                                  CAST(CASE WHEN n <= 4 THEN u.i ELSE (u.i * n) // 4 END AS INT) AS frame_idx
                           FROM v, LATERAL unnest(range(0, CASE WHEN n < 4 THEN n ELSE 4 END)) AS u(i)),
                 lum AS (SELECT p.id, p.frame_idx,
                                CAST(sum(299 * ((xx.x * 7 + yy.y * 13 + p.frame_idx * 31) % 256)
                                       + 587 * ((xx.x * 3 + yy.y * 5 + p.frame_idx * 17) % 256)
                                       + 114 * ((xx.x * 11 + yy.y * 2 + p.frame_idx * 23) % 256)) AS BIGINT) AS lum_sum
                         FROM picks p,
                              LATERAL unnest(range(0, p.w)) AS xx(x),
                              LATERAL unnest(range(0, p.h)) AS yy(y)
                         GROUP BY 1, 2)
            SELECT p.id, CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
                   CAST(p.n AS INT) AS frames, CAST(p.fps AS INT) AS fps_num, TRUE AS ok,
                   p.frame_idx, l.lum_sum
            FROM picks p JOIN lum l ON p.id = l.id AND p.frame_idx = l.frame_idx
            UNION ALL
            SELECT CAST(4 AS BIGINT), 0, 0, 0, 0, FALSE, CAST(-1 AS INT), CAST(0 AS BIGINT)
            ORDER BY id, frame_idx"""),
  )

  /** REAL image RESIZE through the multimodal plumbing (round 10 —
    * the brief's last unexercised media stage): formula-pixel PNGs →
    * nearest-neighbor resize by explicit integer mapping
    * ([[graft.multimodal.Binary.resizeImage]],
    * dst(x,y) = src(⌊x·sw/dw⌋, ⌊y·sh/dh⌋) — pixel-deterministic, so
    * the oracle REPLAYS the resampling from first principles) →
    * PNG re-encode → decode-back dims + exact integer BT.601
    * luminance sum. Junk payloads carry null through and land as
    * ok = false / −1. */
  val q80e = GraftQuery(
    "q80e_image_resize",
    (s, dir) => {
      import s.implicits._
      def png(w: Int, h: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = (x * 5 + y * 7) % 256
            val g = (x * 11 + y * 3) % 256
            val b = (x * 2 + y * 13) % 256
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val rows: Seq[(Long, Array[Byte])] = Seq(
        1L -> png(40, 30), 2L -> png(25, 17),
        3L -> Array[Byte](3, 1, 4)) // not an image
      val df = rows.toDF("id", "payload")
      val resized = Binary.resizeStage(df, "payload", 16, 12)
      Binary.decodeStage(Binary.lumSumStage(resized, "resized"), "resized", Binary.ImageIoDecoder)
        .select($"id", $"media_info.width".as("width"),
          $"media_info.height".as("height"), $"media_info.ok".as("ok"), $"lum_sum")
        .orderBy("id")
    },
    Some("""WITH v(id, sw, sh) AS (VALUES (CAST(1 AS BIGINT), 40, 30), (2, 25, 17)),
                 px AS (SELECT id, (xx.x * sw) // 16 AS sx, (yy.y * sh) // 12 AS sy
                        FROM v, LATERAL unnest(range(0, 16)) AS xx(x),
                                LATERAL unnest(range(0, 12)) AS yy(y)),
                 lum AS (SELECT id,
                                CAST(sum(299 * ((sx * 5 + sy * 7) % 256)
                                       + 587 * ((sx * 11 + sy * 3) % 256)
                                       + 114 * ((sx * 2 + sy * 13) % 256)) AS BIGINT) AS lum_sum
                         FROM px GROUP BY id)
            SELECT id, CAST(16 AS INT) AS width, CAST(12 AS INT) AS height, TRUE AS ok, lum_sum
            FROM lum
            UNION ALL
            SELECT CAST(3 AS BIGINT), 0, 0, FALSE, CAST(-1 AS BIGINT)
            ORDER BY id"""),
  )

  /** The COMPOSED multimodal pipeline in one gate query (round 12):
    * decode → real-pixel embedding → semantic dedup — certifying the
    * stages CHAIN, not just pass individually. Corpus: 8×8 PNGs of
    * 2×2 constant gray blocks, so [[Binary.ImageGridFeatures]]' 4×4
    * grid means recover the 16 block values EXACTLY (constant cells
    * — no summation-order sensitivity) and the embedding is the
    * block array/255, which the oracle recomputes from the VALUES
    * literals. Duplicate payloads are byte-identical → cosine 1.0 →
    * `semanticDedup` drops all but the lowest id; the distinct
    * patterns sit at cosine ≤ 0.70 (checkerboard/inverse/ramp),
    * far under minCos = 0.99, so survivorship is exactly
    * "no lower id with identical blocks" — which the oracle states
    * declaratively. The junk payload embeds all-zero — no direction,
    * no cosine — so only decodable rows enter the dedup and the junk
    * row flows through flagged (ok = false, trivially surviving),
    * never an exception. */
  val q80f = GraftQuery(
    "q80f_multimodal_dedup",
    (s, dir) => {
      import s.implicits._
      def blockPng(cells: Array[Int]): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val v = cells((y / 2) * 4 + (x / 2))
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val pA = Array.tabulate(16)(i => if (i % 2 == 0) 20 else 235)  // checkerboard
      val pB = Array.tabulate(16)(i => if (i % 2 == 0) 235 else 20)  // inverse (cos 0.17 vs A)
      val pC = Array.tabulate(16)(i => 8 + 15 * i)                   // ramp (cos ≤ 0.70 vs A/B)
      val rows: Seq[(Long, Array[Byte])] = Seq(
        1L -> blockPng(pA), 2L -> blockPng(pA), 3L -> blockPng(pB),
        4L -> blockPng(pA), 5L -> Array[Byte](9, 9, 9), 6L -> blockPng(pC))
      val decoded = Binary.decodeStage(rows.toDF("id", "payload"), "payload", Binary.ImageIoDecoder)
      val feat = Binary.featureStage(decoded, "payload", dim = 16, Binary.ImageGridFeatures)
      // only decodable rows have a direction to dedup on (a zero
      // embedding has no cosine — ANSI division); undecodable rows
      // pass through flagged, trivially surviving
      val dedup = graft.operators.Similarity.semanticDedup(
        feat.where($"media_info.ok").select($"id", $"features"), "id", "features",
        numPlanes = 6, dim = 16, minCos = 0.99)
      feat.join(dedup.select($"id", $"survived"), Seq("id"), "left")
        .withColumn("survived", coalesce($"survived", lit(true)))
        .select($"id", $"media_info.width".as("width"), $"media_info.height".as("height"),
          $"media_info.ok".as("ok"),
          round(element_at($"features", 1).cast("double"), 4).as("emb0"),
          round(element_at($"features", 2).cast("double"), 4).as("emb1"),
          round(element_at($"features", 3).cast("double"), 4).as("emb2"),
          round(element_at($"features", 4).cast("double"), 4).as("emb3"),
          $"survived")
        .orderBy("id")
    },
    Some("""WITH cells(id, c) AS (VALUES
              (CAST(1 AS BIGINT), [20,235,20,235,20,235,20,235,20,235,20,235,20,235,20,235]),
              (2, [20,235,20,235,20,235,20,235,20,235,20,235,20,235,20,235]),
              (3, [235,20,235,20,235,20,235,20,235,20,235,20,235,20,235,20]),
              (4, [20,235,20,235,20,235,20,235,20,235,20,235,20,235,20,235]),
              (6, [8,23,38,53,68,83,98,113,128,143,158,173,188,203,218,233])),
            emb AS (SELECT id,
                      round((0.299*c[1] + 0.587*c[1] + 0.114*c[1])/255.0, 4) AS emb0,
                      round((0.299*c[2] + 0.587*c[2] + 0.114*c[2])/255.0, 4) AS emb1,
                      round((0.299*c[3] + 0.587*c[3] + 0.114*c[3])/255.0, 4) AS emb2,
                      round((0.299*c[4] + 0.587*c[4] + 0.114*c[4])/255.0, 4) AS emb3
                    FROM cells),
            surv AS (SELECT a.id,
                       NOT EXISTS (SELECT 1 FROM cells b WHERE b.id < a.id AND b.c = a.c) AS survived
                     FROM cells a)
            SELECT cells.id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height, TRUE AS ok,
                   emb0, emb1, emb2, emb3, survived
            FROM cells JOIN emb USING (id) JOIN surv USING (id)
            UNION ALL
            SELECT CAST(5 AS BIGINT), 0, 0, FALSE,
                   CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), TRUE
            ORDER BY id"""),
  )

  /** Continuous funnel IN the gate:
    * [[graft.streaming.StatefulFunnel.funnelUpdates]] (per-user
    * state-store fold — the continuous windowFunnel materialized
    * view) over a 2-file landing split AT A TIMESTAMP (events before
    * the midpoint, then events at/after it) so delivery is
    * time-ordered across micro-batches — the regime where the
    * operator provably equals the batch fold. Levels only advance,
    * so each user's final level is the max of their update-mode
    * emissions; the oracle is the q71 funnel SQL on the same user
    * slice. Only (user, ts, type) ship through the stream. */
  val q107 = GraftQuery(
    "q107_stream_funnel",
    (s, dir) => {
      import s.implicits._
      val base = s"/tmp/graft_funnel107/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
      val landing = s"$base/landing"
      graft.FixtureClock.time {
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val slice = Tables(s, dir).events.where(col("user_id") < 300)
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
        val bounds = slice.agg(min("ts"), max("ts")).head() // two bounded scalars
        val mid = new java.sql.Timestamp(
          (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
        graft.streaming.Landing.jsonFiles(landing,
          Seq(slice.where(col("ts") < lit(mid)), slice.where(col("ts") >= lit(mid)))
            .map(df => Some(df.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type")))),
          s.sparkContext.hadoopConfiguration)
      }
      val stream = s.readStream.schema("user_id LONG, ts_us LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1").json(landing)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
        .as[graft.streaming.StatefulFunnel.Event]
      val updates = graft.streaming.StatefulFunnel.funnelUpdates(
        stream, Seq("signup", "click", "purchase"), windowDays = 7)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4") // ~300 users (see q104)
      try {
        val q = updates.toDF().writeStream.format("memory").queryName("gq107_sink")
          .outputMode("update").start()
        q.processAllAvailable()
        q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table("gq107_sink")
        .groupBy("user_id").agg(max("level").as("level")) // monotone → final
        .groupBy("level").agg(count(lit(1)).as("n_users"))
        .orderBy("level")
    },
    Some("""WITH ev AS (SELECT * FROM events WHERE user_id < 300),
                 s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
                        WHERE event_type = 'signup' GROUP BY 1),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2, max(t1) AS t1
                        FROM ev e JOIN s1 USING (user_id)
                        WHERE e.event_type = 'click' AND e.ts > t1
                          AND e.ts <= t1 + INTERVAL 7 DAY GROUP BY 1),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t3
                        FROM ev e JOIN s2 USING (user_id)
                        WHERE e.event_type = 'purchase' AND e.ts > t2
                          AND e.ts <= t1 + INTERVAL 7 DAY GROUP BY 1)
            SELECT level, count(*) AS n_users FROM (
              SELECT s1.user_id,
                     CASE WHEN s3.user_id IS NOT NULL THEN 3
                          WHEN s2.user_id IS NOT NULL THEN 2 ELSE 1 END AS level
              FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)) t
            GROUP BY 1 ORDER BY level"""),
  )

  /** Continuous cohort retention IN the gate:
    * [[graft.streaming.StatefulFunnel.retentionUpdates]] — each
    * (user, week_offset) emits exactly once; activity weeks seen
    * BEFORE the user's cohort event arrives are buffered in state, so
    * ANY delivery order converges to the batch answer. The replay
    * exploits that deliberately: files split by event-id parity (not
    * time), so most users' cohort signup lands in a different batch
    * than half their activity. Oracle = the q72 retention SQL on the
    * slice. */
  val q108 = GraftQuery(
    "q108_stream_retention",
    (s, dir) => {
      import s.implicits._
      val base = s"/tmp/graft_ret108/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
      val landing = s"$base/landing"
      graft.FixtureClock.time {
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val slice = Tables(s, dir).events.where(col("user_id") < 400)
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_type"), col("event_id"))
        graft.streaming.Landing.jsonFiles(landing,
          Seq(slice.where(col("event_id") % 2 === 0), slice.where(col("event_id") % 2 === 1))
            .map(df => Some(df.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type")))),
          s.sparkContext.hadoopConfiguration)
      }
      val stream = s.readStream.schema("user_id LONG, ts_us LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1").json(landing)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("event_type"))
        .as[graft.streaming.StatefulFunnel.Event]
      val updates = graft.streaming.StatefulFunnel.retentionUpdates(stream, "signup")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4") // ~400 users (see q104)
      try {
        val q = updates.toDF().writeStream.format("memory").queryName("gq108_sink")
          .outputMode("update").start()
        q.processAllAvailable()
        q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table("gq108_sink") // exactly-once per (user, offset) by contract
        .groupBy("week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("week_offset")
    },
    Some("""WITH ev AS (SELECT * FROM events WHERE user_id < 400),
                 cohort AS (SELECT user_id, min(date_trunc('week', ts)) AS cw
                            FROM ev WHERE event_type = 'signup' GROUP BY 1),
                 act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM ev)
            SELECT CAST(date_diff('day', CAST(cw AS DATE), CAST(aw AS DATE)) / 7 AS INTEGER) AS week_offset,
                   count(DISTINCT user_id) AS n_users
            FROM act JOIN cohort USING (user_id)
            WHERE aw >= cw GROUP BY 1 ORDER BY week_offset"""),
  )

  /** deltaSum analog: sum of POSITIVE deltas of consecutive values.
    * ClickHouse's deltaSum runs in block order (nondeterministic under
    * parallel merge — its own docs warn so); the engine makes the
    * order explicit with a window over (ts, event_id), which is both
    * deterministic and the semantics users actually want. One shuffle
    * on the user key; the sessionize family reuses the partitioning. */
  /** `sequenceNextNode` — the event value AFTER a matched
    * consecutive chain ([[graft.plans.GraftSequenceNextNode]]).
    * Events order by (ts, value) — the deterministic reading — so
    * the oracle can rebuild both modes with window leads: first
    * match of view→click per user (next value after it), and the
    * head mode (chain anchored at the group's first event). */
  val q77d = GraftQuery(
    "q77d_sequence_next",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_sn")
      s.sql("""SELECT user_id,
                      sequenceNextNode('forward', 'first_match')(ts, event_type, true,
                          event_type = 'view', event_type = 'click') AS after_vc,
                      sequenceNextNode('forward', 'head')(ts, event_type, true,
                          event_type = 'view') AS head_next
               FROM events_sn GROUP BY user_id ORDER BY user_id""")
    },
    Some("""WITH o AS (SELECT user_id, event_type AS ev, ts,
                              row_number() OVER w AS rn,
                              lead(event_type, 1) OVER w AS nx1,
                              lead(event_type, 2) OVER w AS nx2
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)),
                 fm AS (SELECT user_id, min(rn) AS rn
                        FROM o WHERE ev = 'view' AND nx1 = 'click' GROUP BY user_id),
                 fmv AS (SELECT o.user_id, o.nx2 AS after_vc
                         FROM o JOIN fm ON o.user_id = fm.user_id AND o.rn = fm.rn),
                 hd AS (SELECT user_id, CASE WHEN ev = 'view' THEN nx1 END AS head_next
                        FROM o WHERE rn = 1),
                 u AS (SELECT DISTINCT user_id FROM events)
            SELECT u.user_id, fmv.after_vc, hd.head_next
            FROM u LEFT JOIN fmv ON u.user_id = fmv.user_id
                   LEFT JOIN hd ON u.user_id = hd.user_id
            ORDER BY u.user_id"""),
  )

  /** ClickHouse window function `nonNegativeDerivative(metric, ts)
    * OVER (…)` run as verbatim SQL: ChSqlParser rewrites it into the
    * lag-based rate expression (clamped at 0; first row and zero
    * time steps land on 0 via NULL-skipping greatest + nullif'd
    * denominator). One window, no extra shuffle beyond the
    * partitionBy — the oracle replays the same lag algebra. */
  val q78b = GraftQuery(
    "q78b_nonneg_derivative",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_nd")
      s.sql("""WITH d AS (SELECT user_id,
                                 nonNegativeDerivative(value, ts)
                                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rate
                          FROM events_nd)
               SELECT user_id, round(sum(rate), 4) AS rate_sum,
                      round(max(rate), 4) AS rate_max, count(*) AS n
               FROM d GROUP BY user_id ORDER BY user_id""")
    },
    Some("""WITH d AS (SELECT user_id,
                              greatest(0, (value - lag(value) OVER w)
                                          / nullif(epoch_us(ts)/1000000.0
                                                   - epoch_us(lag(ts) OVER w)/1000000.0, 0)) AS rate
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, round(sum(rate), 4) AS rate_sum,
                   round(max(rate), 4) AS rate_max, count(*) AS n
            FROM d GROUP BY 1 ORDER BY user_id"""),
  )

  val q78 = GraftQuery(
    "q78_delta_sum",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir).events
        .withColumn("d", col("value") - lag(col("value"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(round(sum(when(col("d") > 0, col("d")).otherwise(lit(0.0))), 2).as("delta_sum"),
             count(lit(1)).as("n"))
        .orderBy("user_id")
    },
    Some("""WITH d AS (SELECT user_id,
                              value - lag(value) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id) AS d
                       FROM events)
            SELECT user_id,
                   round(sum(CASE WHEN d > 0 THEN d ELSE 0 END), 2) AS delta_sum,
                   count(*) AS n
            FROM d GROUP BY 1 ORDER BY user_id"""),
  )

  val all: Seq[GraftQuery] =
    Seq(q70, q71, q72, q73, q73b, q74, q75, q75b, q76, q77, q77b, q77c, q77d, q78, q78b, q80, q80b, q80c, q80d, q80e, q80f, q107, q108)
}
