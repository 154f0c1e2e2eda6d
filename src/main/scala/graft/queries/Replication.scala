package graft.queries

import graft.GraftQuery
import graft.operators.{MatView, Mutate, Replicate}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Wave E of SURVEY.md §2: replication / CDC-apply — the Spark-first
  * re-expression of the reference's ClickPipe modes
  * (/root/reference/src/tools/data_migrator.py:14-27) and the
  * ClickHouse merge-tree semantics their targets rely on.
  *
  * The `events` table plays the role of a CDC stream: key = user_id,
  * version = (ts, event_id), and event_type 'error' doubles as the
  * delete tombstone.
  */
object Replication {

  /** Snapshot replication with column mapping (rename/cast/derive) —
    * ClickPipe tableMappings as a projection. */
  val q30 = GraftQuery(
    "q30_snapshot",
    (s, dir) => Replicate.snapshot(Tables(s, dir).events, Seq(
        "id"         -> col("event_id"),
        "event_time" -> col("ts"),
        "user_id"    -> col("user_id"),
        "type"       -> upper(col("event_type")),
        "amount"     -> round(col("value"), 2),
        "prop_k"     -> regexp_extract(col("props"), "\"k\": (\\d+)", 1)))
      .orderBy(col("id")),
    Some("""SELECT event_id AS id, ts AS event_time, user_id,
                   upper(event_type) AS type, round(value, 2) AS amount,
                   regexp_extract(props, '"k": (\d+)', 1) AS prop_k
            FROM events ORDER BY id"""),
  )

  /** ReplacingMergeTree FINAL: latest state per key. */
  val q31 = GraftQuery(
    "q31_cdc_latest",
    (s, dir) => Replicate.latestByKey(
        Tables(s, dir).events, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id").as("last_event_id"),
              col("event_type").as("last_type"), round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                   round(value, 2) AS last_value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) t
            WHERE rn = 1 ORDER BY user_id"""),
  )

  /** CDC apply with delete tombstones: a key whose latest op is a
    * delete drops out of the materialized state. */
  val q32 = GraftQuery(
    "q32_cdc_deletes",
    (s, dir) => Replicate.applyCdc(
        Tables(s, dir).events, Seq("user_id"), Seq(col("ts"), col("event_id")),
        isDelete = col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
              col("event_type").as("last_type"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_type
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) t
            WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id"""),
  )

  /** SCD-2 validity intervals over each user's event_type changes
    * (restricted key range keeps the oracle result reviewable). */
  val q33 = GraftQuery(
    "q33_scd2",
    (s, dir) => Replicate.scd2(
        Tables(s, dir).events.where(col("user_id") < 20),
        Seq("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumnRenamed("attr_value", "event_type")
      .orderBy(col("user_id"), col("valid_from")),
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events WHERE user_id < 20),
                 c AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id) AS prev FROM e),
                 chg AS (SELECT user_id, ts, event_id, event_type FROM c
                         WHERE prev IS NULL OR prev <> event_type)
            SELECT user_id, event_type, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
            FROM chg ORDER BY user_id, valid_from"""),
  )

  /** AggregatingMergeTree analog: daily partial aggregates re-merged
    * into a monthly rollup — the incremental-materialized-view shape.
    * Partial counts/sums merge exactly (counts are ints, daily sums
    * are rounded on-grid before the re-sum on both sides). */
  val q34 = GraftQuery(
    "q34_incremental_agg",
    (s, dir) => {
      val daily = Tables(s, dir).events
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      daily.groupBy(date_trunc("month", col("d")).as("month"), col("event_type"))
        .agg(sum("c").as("cnt"), round(sum("v"), 2).as("val"))
        .orderBy(col("month"), col("event_type"))
    },
    Some("""WITH daily AS (SELECT date_trunc('day', ts) AS d, event_type,
                                  count(*) AS c, round(sum(value), 2) AS v
                           FROM events GROUP BY 1, 2)
            SELECT date_trunc('month', d) AS month, event_type,
                   CAST(sum(c) AS BIGINT) AS cnt, round(sum(v), 2) AS val
            FROM daily GROUP BY 1, 2 ORDER BY month, event_type"""),
  )

  /** AggregatingMergeTree analog with true -State/-Merge semantics:
    * daily partial states (count, on-grid sum, exact distinct SET) are
    * materialized first, then MERGED into the monthly rollup without
    * touching raw rows again — set-union playing uniqExactState /
    * uniqExactMerge. The exact-set state is the heavy-exact path; the
    * sketch path (hll_sketch_agg / hll_union_agg, same query shape
    * with O(1) state per group) is cross-checked against it in
    * OperatorsSpec and is the default at 100 TB. */
  val q35 = GraftQuery(
    "q35_agg_state_merge",
    (s, dir) => {
      val states = Tables(s, dir).events
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("cnt_state"), round(sum("value"), 2).as("sum_state"),
             collect_set("user_id").as("uniq_state"))
      states.groupBy(date_trunc("month", col("d")).as("month"))
        .agg(sum("cnt_state").as("cnt"), round(sum("sum_state"), 2).as("total"),
             size(array_distinct(flatten(collect_list("uniq_state")))).as("uniq_users"))
        .orderBy("month")
    },
    Some("""WITH st AS (SELECT date_trunc('day', ts) AS d, event_type, count(*) AS c,
                               round(sum(value), 2) AS v
                        FROM events GROUP BY 1, 2),
                 m AS (SELECT date_trunc('month', d) AS month, CAST(sum(c) AS BIGINT) AS cnt,
                              round(sum(v), 2) AS total FROM st GROUP BY 1),
                 u AS (SELECT date_trunc('month', ts) AS month,
                              CAST(count(DISTINCT user_id) AS INT) AS uniq_users
                       FROM events GROUP BY 1)
            SELECT m.month, cnt, total, uniq_users FROM m JOIN u USING (month) ORDER BY month"""),
  )

  /** The -State/-Merge combinators in their VERBATIM ClickHouse MV
    * spelling (countState/sumState/minState/avgState at the daily
    * grain, countMerge/sumMerge/minMerge/avgMerge at the monthly
    * re-merge) — the SQL an AggregatingMergeTree materialized view
    * emits, running unchanged through ChDialect. Sums re-merge at
    * round-0 grid (parallel-order tolerance, q10 convention);
    * uniqState/uniqMerge (HLL binary states) are registered too but
    * sketch estimates stay out of oracled output (spec-pinned). */
  val q35b = GraftQuery(
    "q35b_state_merge_sql",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_sm2")
      s.sql("""WITH states AS (
                 SELECT toStartOfDay(ts) AS d, event_type,
                        countState() AS cnt_st,
                        sumState(value) AS sum_st,
                        minState(value) AS min_st,
                        avgState(value) AS avg_st
                 FROM events_sm2 GROUP BY d, event_type)
               SELECT toStartOfMonth(d) AS month,
                      CAST(countMerge(cnt_st) AS BIGINT) AS cnt,
                      round(sumMerge(sum_st), 0) AS total,
                      round(minMerge(min_st), 2) AS min_v,
                      round(avgMerge(avg_st), 4) AS avg_v
               FROM states GROUP BY toStartOfMonth(d) ORDER BY month""")
    },
    Some("""WITH states AS (SELECT date_trunc('day', ts) AS d, event_type,
                                   count(*) AS c, sum(value) AS sv,
                                   min(value) AS mv, count(value) AS cv
                            FROM events GROUP BY 1, 2)
            SELECT date_trunc('month', d) AS month,
                   CAST(sum(c) AS BIGINT) AS cnt,
                   round(sum(sv), 0) AS total,
                   round(min(mv), 2) AS min_v,
                   round(sum(sv) / sum(cv), 4) AS avg_v
            FROM states GROUP BY 1 ORDER BY month"""),
  )

  /** The uniqState-import MIGRATION story as one driver-checked gate
    * (round 15): an MV store imported from a live ClickHouse carries
    * FOREIGN binary uniq states this engine did not write — merging
    * them fails LOUDLY (never silently wrong, the q35b descope
    * contract), and [[Replicate.rematerializeMv]] replays the MV's
    * defining SELECT against the imported raw table and swaps the
    * store, after which every state is engine-written and the merge
    * is exact. The gate output is the post-rematerialize merge plus a
    * flag proving the foreign blob DID refuse; distinct keys are
    * bucketed (mod 211) to stay inside the HLL sketch's exact range
    * so the DuckDB oracle can pin the values. */
  val q35c = GraftQuery(
    "q35c_mv_rematerialize",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_remat")
      graft.FixtureClock.time {
        dropWithLocation(s, "gq35c_raw")
        dropWithLocation(s, "gq35c_mv")
        s.sql("CREATE TABLE gq35c_raw (et String, u Int64, v Float64) ENGINE = MergeTree ORDER BY et")
        s.sql("""INSERT INTO gq35c_raw
                 SELECT event_type, user_id % 211, value FROM events_remat""")
        // the simulated import: plain sum states migrate as data, the
        // uniq blob is a FOREIGN binary this engine didn't write
        s.sql("""SELECT et, sumState(v) AS sum_st, unhex('FEEDFACE') AS uq_st
                 FROM gq35c_raw GROUP BY et""")
          .write.mode("overwrite").saveAsTable("gq35c_mv")
      }
      val foreignFailed =
        try {
          s.sql("SELECT et, uniqMerge(uq_st) FROM gq35c_mv GROUP BY et").collect()
          0 // would mean a foreign blob silently merged — the oracle pins 1
        } catch { case _: Exception => 1 }
      graft.operators.Replicate.rematerializeMv(s, "gq35c_mv",
        """SELECT sumState(v) AS sum_st, uniqState(u) AS uq_st, et
           FROM gq35c_raw GROUP BY et""")
      s.sql(s"""SELECT et, round(sumMerge(sum_st), 0) AS total,
                       CAST(uniqMerge(uq_st) AS BIGINT) AS uniq_buckets,
                       CAST($foreignFailed AS INT) AS foreign_failed
                FROM gq35c_mv GROUP BY et ORDER BY et""")
    },
    Some("""SELECT event_type AS et, round(sum(value), 0) AS total,
                   CAST(count(DISTINCT user_id % 211) AS BIGINT) AS uniq_buckets,
                   CAST(1 AS INT) AS foreign_failed
            FROM events GROUP BY 1 ORDER BY et"""),
  )

  /** CollapsingMergeTree(sign) FINAL: 'error' events are the cancel
    * rows; a user survives only with positive net sign, carrying the
    * latest +1 row. */
  val q36 = GraftQuery(
    "q36_collapsing",
    (s, dir) => {
      val signed = Tables(s, dir).events
        .withColumn("sign", when(col("event_type") === "error", lit(-1)).otherwise(lit(1)))
      Replicate.collapse(signed, Seq("user_id"), col("sign"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
                round(col("value"), 2).as("last_value"), col("net"))
        .orderBy(col("user_id"))
    },
    Some("""WITH s AS (SELECT *, CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS sign
                       FROM events),
                 n AS (SELECT user_id, CAST(sum(sign) AS BIGINT) AS net FROM s GROUP BY 1),
                 last AS (SELECT user_id, event_id, value FROM
                           (SELECT *, row_number() OVER (PARTITION BY user_id
                                                         ORDER BY ts DESC, event_id DESC) AS rn
                            FROM s WHERE sign = 1) t
                          WHERE rn = 1)
            SELECT n.user_id, last.event_id AS last_event_id,
                   round(last.value, 2) AS last_value, net
            FROM n JOIN last USING (user_id) WHERE net > 0 ORDER BY user_id"""),
  )

  /** ClickHouse `FROM table FINAL` spelled verbatim: the parser maps
    * it to the `_final` companion view [[Replicate.registerWithFinal]]
    * maintains (latest row per key), so migrated SQL that relies on
    * ReplacingMergeTree FINAL reads runs unchanged. The oracle is the
    * same collapse written out as a window. */
  val q37 = GraftQuery(
    "q37_final",
    (s, dir) => {
      Replicate.registerWithFinal(Tables(s, dir).events, "user_state",
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      s.sql("""SELECT event_type AS last_type, count(*) AS n_users,
                      round(sum(value), 2) AS total
               FROM user_state FINAL
               GROUP BY event_type ORDER BY last_type""")
    },
    Some("""SELECT event_type AS last_type, count(*) AS n_users, round(sum(value), 2) AS total
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) t
            WHERE rn = 1 GROUP BY 1 ORDER BY last_type"""),
  )

  /** Incrementally-maintained materialized view (MatView): the events
    * stream lands in three batches — init + two O(delta) refreshes
    * appending partial states — and the read is the -Merge over
    * states. The oracle recomputes the same rollup from raw rows, so
    * the hash-match proves init+refresh+merge ≡ full recompute. The
    * store is rebuilt from scratch on every run (init overwrites), so
    * re-runs can't double-append. An HLL distinct-user sketch rides
    * in the same store; being approximate it stays out of the oracled
    * output (exactness-checked in MatViewSpec instead). */
  val q39 = GraftQuery(
    "q39_matview",
    (s, dir) => {
      val spec = MatView.spec(Seq("event_type"),
        MatView.countState("cnt"),
        MatView.sumState("sum_v", round(col("value"), 2)),
        MatView.minState("min_ts", col("ts")),
        MatView.maxState("max_ts", col("ts")))
      val path = s"/tmp/graft_matview/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val e = Tables(s, dir).events
      val cut1 = "1995-06-01"
      val cut2 = "1997-01-01"
      MatView.init(e.where(col("ts") < cut1), spec, path)
      MatView.refresh(e.where(col("ts") >= cut1 && col("ts") < cut2), spec, path)
      MatView.refresh(e.where(col("ts") >= cut2), spec, path)
      MatView.read(s, spec, path)
        .select(col("event_type"), col("cnt"), round(col("sum_v"), 2).as("sum_v"),
                col("min_ts"), col("max_ts"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS cnt, round(sum(round(value, 2)), 2) AS sum_v,
                   min(ts) AS min_ts, max(ts) AS max_ts
            FROM events GROUP BY 1 ORDER BY event_type"""),
  )

  /** VersionedCollapsingMergeTree FINAL ([[Replicate.collapseVersioned]]):
    * every order is a +1 state versioned by o_orderkey; every third
    * order gets a −1 cancel at the same version. FINAL = surviving
    * state with the highest version per customer — two map-side-
    * combined shuffles, no window sort. Customers with every version
    * cancelled disappear, as in ClickHouse. */
  val q36b = GraftQuery(
    "q36b_versioned_collapse",
    (s, dir) => {
      val o = Tables(s, dir).orders.select("o_custkey", "o_orderkey", "o_totalprice")
      val states  = o.withColumn("sign", lit(1))
      val cancels = o.where(col("o_orderkey") % 3 === 0).withColumn("sign", lit(-1))
      Replicate.collapseVersioned(states.unionByName(cancels),
          Seq("o_custkey"), col("o_orderkey"), col("sign"))
        .select(col("o_custkey"), col("o_orderkey").as("last_version"),
                round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey")
    },
    Some("""WITH surv AS (SELECT o_custkey, o_orderkey, o_totalprice
                          FROM orders WHERE o_orderkey % 3 <> 0)
            SELECT o_custkey, max(o_orderkey) AS last_version,
                   round(arg_max(o_totalprice, o_orderkey), 2) AS price
            FROM surv GROUP BY 1 ORDER BY o_custkey"""),
  )

  /** ClickHouse file-format surface in the registry: a slice of
    * orders lands as CSVWithNames and as JSONEachRow
    * (`graft.sources.Formats`), reads back through the same format
    * names, and the round-tripped union must aggregate exactly like
    * the parquet original (the oracle never sees the files). */
  val q30b = GraftQuery(
    "q30b_format_roundtrip",
    (s, dir) => {
      // per-invocation path: concurrent sessions (driver verify + a
      // local bench, say) must not clobber each other's files
      val root = s"/tmp/graft_fmt/${dir.replaceAll("[^A-Za-z0-9]", "_")}_${java.util.UUID.randomUUID().toString.take(8)}"
      val slice = Tables(s, dir).orders
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      graft.sources.Formats.write(slice, s"$root/csv", "CSVWithNames")
      graft.sources.Formats.write(slice, s"$root/json", "JSONEachRow")
      val schema = "o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
      val csv  = graft.sources.Formats.read(s, s"$root/csv", "CSVWithNames", Some(schema))
      val json = graft.sources.Formats.read(s, s"$root/json", "JSONEachRow", Some(schema))
      csv.unionByName(json)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, 2 * count(*) AS cnt,
                   round(2 * sum(o_totalprice), 2) AS total
            FROM orders WHERE o_orderkey <= 2000
            GROUP BY 1 ORDER BY o_orderpriority"""),
  )

  /** Arrow IPC in the registry (round 19, `graft.sources.ArrowIpc`):
    * a slice of orders — timestamps included, the type Arrow exports
    * most often trip on — lands as the random-access Arrow FILE
    * format and as ArrowStream, reads back through the same format
    * names, and the round-tripped union must aggregate exactly like
    * the parquet original (the oracle never sees the files). The
    * write runs distributed (one IPC part file per partition); the
    * read decodes one file per task. */
  val q30c = GraftQuery(
    "q30c_arrow_roundtrip",
    (s, dir) => {
      val root = s"/tmp/graft_arrow/${dir.replaceAll("[^A-Za-z0-9]", "_")}_${java.util.UUID.randomUUID().toString.take(8)}"
      val slice = Tables(s, dir).orders
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
                col("o_orderdate"))
      graft.sources.Formats.write(slice, s"$root/arrow", "Arrow")
      graft.sources.Formats.write(slice, s"$root/arrows", "ArrowStream")
      val file   = graft.sources.Formats.read(s, s"$root/arrow", "Arrow")
      val stream = graft.sources.Formats.read(s, s"$root/arrows", "ArrowStream")
      file.unionByName(stream)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"),
             max(col("o_orderdate")).as("latest"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, 2 * count(*) AS cnt,
                   round(2 * sum(o_totalprice), 2) AS total,
                   max(o_orderdate) AS latest
            FROM orders WHERE o_orderkey <= 2000
            GROUP BY 1 ORDER BY o_orderpriority"""),
  )

  /** SummingMergeTree FINAL (`Replicate.collapseSumming`): pre-agg
    * rows collapse per sorting key with numeric columns summed and
    * the remaining payload taking the deterministic group minimum —
    * the counters-table engine, one map-side-combined shuffle. */
  val q36c = GraftQuery(
    "q36c_summing",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
      Replicate.collapseSumming(li, Seq("l_orderkey"), Seq("l_quantity", "l_extendedprice"))
        .where(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"),
                round(col("l_quantity"), 2).as("qty"),
                round(col("l_extendedprice"), 2).as("total"),
                col("l_returnflag").as("flag"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, round(sum(l_quantity), 2) AS qty,
                   round(sum(l_extendedprice), 2) AS total,
                   min(l_returnflag) AS flag
            FROM lineitem WHERE l_orderkey <= 2000 GROUP BY 1 ORDER BY l_orderkey"""),
  )

  /** MergeTree TTL, executed the ClickHouse way: orders landed under
    * PARTITION BY year, then a retention cutoff mid-1995 — every year
    * before 1995 is dropped as a whole part (directory delete, zero
    * rows read), and only the 1995 boundary partition pays a
    * row-level rewrite. The layout is rebuilt each run because TTL
    * mutates it; the oracle is the surviving-row filter on the raw
    * table. */
  val q98 = GraftQuery(
    "q98_ttl",
    (s, dir) => {
      val path = s"/tmp/graft_ttl/${dir.replaceAll("[^A-Za-z0-9]", "_")}/orders_by_year"
      // land only the columns the TTL query reads: the layout is
      // rebuilt every run (TTL mutates it destructively), so a
      // projected landing is the same partition-drop exercise at a
      // third of the IO; the landing is fixture time, the TTL is the
      // operator under test
      graft.FixtureClock.time {
        Tables(s, dir).orders
          .select(col("o_orderdate"), col("o_totalprice"))
          .withColumn("yr", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("yr").parquet(path)
      }
      Mutate.ttl(s, path, "yr",
        rowExpired = col("o_orderdate") < "1995-07-01",
        partitionWhollyExpired = col("yr") < 1995)
      s.read.parquet(path)
        .groupBy(col("yr").cast("long").as("yr"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS total
            FROM orders WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
            GROUP BY 1 ORDER BY yr"""),
  )

  /** Drop a catalog table AND its managed location (an aborted prior
    * run can leave the directory behind, failing the next CREATE). */
  private def dropWithLocation(s: org.apache.spark.sql.SparkSession, t: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")))
    val p = new org.apache.hadoop.fs.Path(wh, t)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** The post-migration maintenance SQL surface, gate-checked end to
    * end: verbatim ClickHouse `ALTER TABLE … DELETE` then `… UPDATE`
    * execute as partition-pruned copy-on-write mutations
    * ([[graft.plans.ChCommands]]) against a table created and loaded
    * through the CH DDL front-end; the oracle replays the same
    * delete-then-update algebra declaratively. Bounded by key range,
    * so the rebuilt table stays constant-size at any SF. */
  val q100 = GraftQuery(
    "q100_mutation_sql",
    (s, dir) => {
      graft.FixtureClock.time {
        dropWithLocation(s, "gq100")
        s.sql("""CREATE TABLE gq100 (id UInt64, status String, total Float64, prio String)
                 ENGINE = MergeTree PARTITION BY prio ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq100_src")
        s.sql("""INSERT INTO gq100
                 SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
                 FROM gq100_src WHERE o_orderkey < 20000""")
      }
      s.sql("ALTER TABLE gq100 DELETE WHERE total < 50000")
      s.sql("ALTER TABLE gq100 UPDATE status = 'X', total = total * 2 WHERE id % 10 = 0")
      // CH 23+ lightweight-delete spelling, same executable path
      s.sql("DELETE FROM gq100 WHERE id % 7 = 3")
      s.sql("""SELECT prio, status, count(*) AS cnt, round(sum(total), 2) AS total
               FROM gq100 GROUP BY prio, status ORDER BY prio, status""")
    },
    Some("""WITH base AS (SELECT o_orderkey AS id, o_orderstatus AS status,
                                 o_totalprice AS total, o_orderpriority AS prio
                          FROM orders WHERE o_orderkey < 20000),
                 del AS (SELECT * FROM base WHERE NOT (total < 50000)),
                 upd AS (SELECT id, CASE WHEN id % 10 = 0 THEN 'X' ELSE status END AS status,
                                CASE WHEN id % 10 = 0 THEN total * 2 ELSE total END AS total,
                                prio
                         FROM del),
                 del2 AS (SELECT * FROM upd WHERE NOT (id % 7 = 3))
            SELECT prio, status, count(*) AS cnt, round(sum(total), 2) AS total
            FROM del2 GROUP BY prio, status ORDER BY prio, status"""),
  )

  /** `OPTIMIZE TABLE … FINAL DEDUPLICATE`, gate-checked: many small
    * inserts (one of them a verbatim duplicate) compact to one file
    * per partition and the duplicate block collapses; the result must
    * be read-invariantly the distinct base slice. */
  val q101 = GraftQuery(
    "q101_optimize_sql",
    (s, dir) => {
      graft.FixtureClock.time {
        dropWithLocation(s, "gq101")
        s.sql("""CREATE TABLE gq101 (id UInt64, v Float64, prio String)
                 ENGINE = MergeTree PARTITION BY prio ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq101_src")
        val ins = """INSERT INTO gq101
                     SELECT o_orderkey, o_totalprice, o_orderpriority
                     FROM gq101_src WHERE o_orderkey >= %d AND o_orderkey < %d"""
        s.sql(ins.format(0, 4000)); s.sql(ins.format(4000, 8000)); s.sql(ins.format(8000, 12000))
        s.sql(ins.format(0, 4000)) // duplicate part, collapsed by DEDUPLICATE
      }
      s.sql("OPTIMIZE TABLE gq101 FINAL DEDUPLICATE")
      s.sql("""SELECT prio, count(*) AS cnt, round(sum(v), 2) AS total
               FROM gq101 GROUP BY prio ORDER BY prio""")
    },
    Some("""WITH base AS (SELECT DISTINCT o_orderkey AS id, o_totalprice AS v,
                                 o_orderpriority AS prio
                          FROM orders WHERE o_orderkey < 12000)
            SELECT prio, count(*) AS cnt, round(sum(v), 2) AS total
            FROM base GROUP BY prio ORDER BY prio"""),
  )

  /** The Kafka-engine → MV → TO-table chain, gate-checked end to end
    * from verbatim CH DDL: a bounded NDJSON landing plays the topic
    * (file transport, `kafka_max_block_size = 1` forcing one file per
    * micro-batch), each block runs the MV's SELECT and appends an
    * idempotent partial to the TO-table, and the query reads the
    * TO-table with the AggregatingMergeTree merge-on-read GROUP BY.
    * Counts and integer cent-sums are block-partition-invariant, so
    * the result is deterministic however the stream is blocked and
    * the DuckDB oracle can replay it from the source table directly.
    * The landing is bounded (events ≤ a fixed key slice) so the
    * streaming leg stays constant-cost at any SF. */
  val q102 = GraftQuery(
    "q102_kafka_mv_chain",
    (s, dir) => {
      val base = s"/tmp/graft_kafka/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
      val (landing, target, ckpt) = (s"$base/landing", s"$base/target", s"$base/ckpt")
      graft.FixtureClock.time {
        // fresh chain per run: a stale checkpoint would skip the replay
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        Tables(s, dir).events
          .where(col("user_id") < 50)
          .select(col("user_id"), col("event_type"),
                  expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
          .repartition(3)
          .write.mode("overwrite").json(landing)
        // Spark's json writer leaves a _SUCCESS marker the schema'd
        // streaming reader must not treat as data
        fs.delete(new org.apache.hadoop.fs.Path(landing, "_SUCCESS"), false)
      }
      val q = graft.streaming.KafkaEngine.fromDdl(s,
        s"""CREATE TABLE gq102_queue (user_id UInt64, event_type String, cents Int64)
            ENGINE = Kafka SETTINGS kafka_broker_list = '$landing',
            kafka_topic_list = 'events', kafka_group_name = 'g102',
            kafka_format = 'JSONEachRow', kafka_max_block_size = '1'""",
        """CREATE MATERIALIZED VIEW gq102_mv TO gq102_target AS
           SELECT user_id, event_type, count(*) AS cnt, sum(cents) AS cents
           FROM gq102_queue GROUP BY user_id, event_type""",
        target, ckpt)
      q.processAllAvailable()
      q.stop()
      s.read.parquet(target)
        .groupBy("user_id", "event_type")
        .agg(sum("cnt").as("cnt"), sum("cents").as("cents"))
        .orderBy("user_id", "event_type")
    },
    Some("""SELECT user_id, event_type, count(*) AS cnt,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM events WHERE user_id < 50
            GROUP BY user_id, event_type ORDER BY user_id, event_type"""),
  )

  /** ClickHouse schema-evolution DDL end to end in the gate: ADD
    * COLUMN (CH type-default backfill AND a DEFAULT expression with
    * AFTER positioning), RENAME, a mutation over the renamed column,
    * MODIFY type, and a scratch-column DROP — five data rewrites
    * through the crash-safe swap, then an aggregate the oracle
    * replays declaratively. Bounded by key range like q100. */
  val q103 = GraftQuery(
    "q103_alter_column_sql",
    (s, dir) => {
      graft.FixtureClock.time {
        dropWithLocation(s, "gq103")
        s.sql("""CREATE TABLE gq103 (id UInt64, total Float64, prio String)
                 ENGINE = MergeTree PARTITION BY prio ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq103_src")
        s.sql("""INSERT INTO gq103 SELECT o_orderkey, o_totalprice, o_orderpriority
                 FROM gq103_src WHERE o_orderkey < 8000""")
      }
      s.sql("ALTER TABLE gq103 ADD COLUMN flag UInt8") // backfills 0, not null
      s.sql("ALTER TABLE gq103 ADD COLUMN half Float64 DEFAULT total / 2 AFTER total")
      s.sql("ALTER TABLE gq103 ADD COLUMN scratch Nullable(String)")
      s.sql("ALTER TABLE gq103 RENAME COLUMN flag TO is_big")
      s.sql("ALTER TABLE gq103 UPDATE is_big = 1 WHERE total >= 100000")
      s.sql("ALTER TABLE gq103 MODIFY COLUMN is_big UInt64")
      s.sql("ALTER TABLE gq103 DROP COLUMN scratch")
      s.sql("""SELECT prio, CAST(sum(is_big) AS BIGINT) AS n_big, count(*) AS cnt,
                      round(sum(half), 2) AS half_total
               FROM gq103 GROUP BY prio ORDER BY prio""")
    },
    Some("""WITH base AS (SELECT o_totalprice AS total, o_orderpriority AS prio
                          FROM orders WHERE o_orderkey < 8000)
            SELECT prio,
                   CAST(sum(CASE WHEN total >= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
                   count(*) AS cnt, round(sum(total / 2), 2) AS half_total
            FROM base GROUP BY prio ORDER BY prio"""),
  )

  /** TTL DDL executing end to end (round 10): verbatim
    * `ALTER TABLE … MODIFY TTL d + INTERVAL 30 DAY` persists the
    * expiry rule beside the data, `MATERIALIZE TTL` applies it through
    * the same partition-pruned mutate path as ALTER DELETE
    * ([[graft.plans.ChModifyTtlCommand]]). Deterministic against the
    * wall clock by construction: expired rows sit in 2019–2020 and
    * survivors in 2123, so `d + 30 days <= now()` has the same truth
    * value until 2123 however long the gate takes. The oracle drops
    * the expired tier declaratively. (q98 gates the partition-drop
    * TTL operator itself; this gates the DDL front door.) */
  val q98b = GraftQuery(
    "q98b_ttl_ddl",
    (s, dir) => {
      graft.FixtureClock.time {
        dropWithLocation(s, "gq98b")
        s.sql("""CREATE TABLE gq98b (id UInt64, total Float64, d DateTime, prio String)
                 ENGINE = MergeTree PARTITION BY prio ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq98b_src")
        // partition columns land LAST in a Spark table schema; the
        // positional INSERT lists them last to match
        s.sql("""INSERT INTO gq98b
                 SELECT o_orderkey, o_totalprice,
                        CASE WHEN o_orderkey % 3 = 0
                             THEN timestamp'2020-01-01 00:00:00'
                             ELSE timestamp'2123-01-01 00:00:00' END,
                        o_orderpriority
                 FROM gq98b_src WHERE o_orderkey < 6000""")
      }
      s.sql("ALTER TABLE gq98b MODIFY TTL d + INTERVAL 30 DAY")
      s.sql("ALTER TABLE gq98b MATERIALIZE TTL")
      s.sql("""SELECT prio, count(*) AS cnt, round(sum(total), 2) AS total
               FROM gq98b GROUP BY prio ORDER BY prio""")
    },
    Some("""SELECT o_orderpriority AS prio, count(*) AS cnt,
                   round(sum(o_totalprice), 2) AS total
            FROM orders WHERE o_orderkey < 6000 AND o_orderkey % 3 <> 0
            GROUP BY 1 ORDER BY prio"""),
  )

  /** TTL GROUP BY … SET EXECUTING (round 11): expired rows collapse
    * into one row per group on MATERIALIZE — SET columns by their
    * declared aggregates, other non-key columns by `min` (the
    * deterministic stand-in for CH's implicit `any`); partition
    * columns auto-join the grouping (collapse never crosses a
    * partition, CH's own per-part boundary). Century-stable fixture:
    * expired rows sit in 2020, survivors in 2123. The oracle replays
    * the rollup algebra (live rows + one collapsed row per group);
    * sums re-merge at round-0 grid (q35b convention). */
  val q98c = GraftQuery(
    "q98c_ttl_groupby",
    (s, dir) => {
      graft.FixtureClock.time {
        dropWithLocation(s, "gq98c")
        s.sql("""CREATE TABLE gq98c (id UInt64, total Float64, d DateTime, prio String)
                 ENGINE = MergeTree PARTITION BY prio ORDER BY id""")
        Tables(s, dir).orders.createOrReplaceTempView("gq98c_src")
        s.sql("""INSERT INTO gq98c
                 SELECT o_orderkey, o_totalprice,
                        CASE WHEN o_orderkey % 3 = 0
                             THEN timestamp'2020-01-01 00:00:00'
                             ELSE timestamp'2123-01-01 00:00:00' END,
                        o_orderpriority
                 FROM gq98c_src WHERE o_orderkey < 6000""")
      }
      s.sql("""ALTER TABLE gq98c MODIFY TTL d + INTERVAL 30 DAY
               GROUP BY prio SET total = sum(total)""")
      s.sql("ALTER TABLE gq98c MATERIALIZE TTL")
      s.sql("""SELECT prio, count(*) AS cnt, round(sum(total), 0) AS total,
                      CAST(min(id) AS BIGINT) AS min_id
               FROM gq98c GROUP BY prio ORDER BY prio""")
    },
    Some("""WITH src AS (SELECT o_orderkey AS id, o_totalprice AS total,
                                o_orderpriority AS prio,
                                (o_orderkey % 3 = 0) AS expired
                         FROM orders WHERE o_orderkey < 6000)
            SELECT prio,
                   CAST(sum(CASE WHEN expired THEN 0 ELSE 1 END)
                        + max(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT) AS cnt,
                   round(sum(total), 0) AS total,
                   CAST(min(id) AS BIGINT) AS min_id
            FROM src GROUP BY prio ORDER BY prio"""),
  )

  /** Watermarked event-time window aggregation IN the gate — real
    * Structured Streaming semantics made deterministic: a 5-file
    * landing replayed one file per micro-batch (mtimes pin the
    * order). File 0 is the on-time data; file 1 is EMPTY — its only
    * job is a flush batch in which the watermark from batch 0 evicts
    * every closed window (Spark drops a late row only if its window
    * was evicted in a PRIOR batch; without this batch the late rows
    * would merge into still-open state — probe-verified); file 2
    * holds the rows withheld from file 0 whose 1-day window closed
    * more than 6 h (the watermark delay) before file 0's max event
    * time — Spark MUST drop them (numRowsDroppedByWatermark); files
    * 3/4 are far-future sentinels pushing the watermark so append
    * mode flushes the remaining windows while the sentinels' own
    * windows never close. Determinism: the late-selection threshold
    * is the EXACT watermark Spark computes (ms-floored max − 6 h),
    * selected rows satisfy window_end < W ⇒ dropped, everything else
    * arrives in batch 0 under watermark 0 ⇒ kept — so the oracle
    * replays "group the not-withheld rows" declaratively with no
    * boundary cases. State bound at scale: watermark delay caps open
    * windows per key. */
  val q104 = GraftQuery(
    "q104_stream_window",
    (s, dir) => {
      val base = s"/tmp/graft_stream/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
      val (landing, target, ckpt) =
        (s"$base/landing", s"$base/target", s"$base/ckpt")
      graft.FixtureClock.time {
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val slice = Tables(s, dir).events.where(col("user_id") < 20)
          .select(col("user_id"),
            // NTZ sources normalize to TIMESTAMP (session is UTC, values preserved)
            col("ts").cast("timestamp").as("ts"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
        // the exact watermark Spark will compute after batch 1:
        // ms-floored max event time minus the 6h delay
        val maxTs = slice.agg(max("ts")).head().getTimestamp(0) // one bounded scalar
        val wm = java.sql.Timestamp.from(
          java.time.Instant.ofEpochMilli(maxTs.getTime).minusSeconds(6 * 3600))
        val winEnd = expr("date_trunc('DAY', ts) + INTERVAL 1 DAY")
        val lateCond = col("user_id") % 5 === 3 && winEnd < lit(wm)
        def sentinel(isoTs: String) = s.range(1).select(
          lit(9999L).as("user_id"), lit(isoTs).cast("timestamp").as("ts"), lit(0L).as("cents"))
        val files = Seq(
          Some(slice.where(!lateCond)), None /* empty flush batch */,
          Some(slice.where(lateCond)),
          Some(sentinel("2100-01-01 00:00:00")), Some(sentinel("2100-01-02 00:00:00")))
        graft.streaming.Landing.jsonFiles(landing,
          files.map(_.map(_.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("cents")))),
          s.sparkContext.hadoopConfiguration)
      }
      val schema = "user_id LONG, ts_us LONG, cents LONG"
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(landing)
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"), col("cents"))
      val agg = graft.streaming.WindowedAgg.tumbling(
        stream, "ts", watermarkDelay = "6 hours", windowDur = "1 day",
        keys = Seq("user_id"),
        aggs = Seq(count(lit(1)).as("cnt"), sum("cents").as("cents")))
      // State-store partition count is pinned from shuffle.partitions
      // at the query's FIRST run. ~21 keys here — 32 state partitions
      // would mean 32 state-store tasks per micro-batch (×5 batches)
      // for a handful of rows each. Size state partitions to key
      // cardinality, exactly as one would on a real cluster; restore
      // the session default for everything after.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = agg.select("user_id", "window_start", "cnt", "cents")
          .writeStream.format("parquet").outputMode("append")
          .option("path", target).option("checkpointLocation", ckpt).start()
        q.processAllAvailable()
        q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.read.parquet(target).orderBy("user_id", "window_start")
    },
    Some("""WITH slice AS (SELECT user_id, ts, CAST(floor(value * 100) AS BIGINT) AS cents
                           FROM events WHERE user_id < 20),
                 wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 6 HOUR AS w
                        FROM slice),
                 kept AS (SELECT * FROM slice
                          WHERE NOT (user_id % 5 = 3 AND
                                     date_trunc('day', ts) + INTERVAL 1 DAY < (SELECT w FROM wm)))
            SELECT user_id, date_trunc('day', ts) AS window_start,
                   count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS cents
            FROM kept GROUP BY 1, 2 ORDER BY user_id, window_start"""),
  )

  /** Streaming CDC apply IN the gate: the
    * [[graft.streaming.CdcApply]] flatMapGroupsWithState operator
    * (latest-version-per-key with tombstones — the continuous
    * ReplacingMergeTree) driven over a 3-file changelog replayed one
    * file per micro-batch, deliberately OUT OF ORDER (v2 updates
    * arrive before v1 inserts, tombstones last) to prove the
    * at-least-once/out-of-order safety the operator claims. The
    * memory sink accumulates update-mode emissions; the final state
    * is the max-version row per key (deterministic — emission only
    * happens when a version strictly increases, batch boundaries are
    * mtime-pinned). The oracle replays insert→update→delete
    * declaratively. Gate-bounded key slice keeps the driver-side
    * memory sink small; the production path is the same operator
    * into foreachBatch upserts. */
  val q105 = GraftQuery(
    "q105_stream_cdc",
    (s, dir) => {
      import s.implicits._
      val base = s"/tmp/graft_cdc105/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
      val landing = s"$base/landing"
      graft.FixtureClock.time {
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val slice = Tables(s, dir).orders.where(col("o_orderkey") < 2000)
          .select(col("o_orderkey").as("key"), col("o_orderpriority").as("prio"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        val v2 = slice.where($"key" % 3 === 0).select($"key",
          lit(2L).as("version"), lit(false).as("deleted"), $"prio", ($"cents" * 2).as("cents"))
        val v1 = slice.select($"key", lit(1L).as("version"), lit(false).as("deleted"),
          $"prio", $"cents")
        val v3 = slice.where($"key" % 5 === 0).select($"key",
          lit(3L).as("version"), lit(true).as("deleted"), $"prio", $"cents")
        graft.streaming.Landing.jsonFiles(landing, Seq(v2, v1, v3).map(Some(_)),
          s.sparkContext.hadoopConfiguration)
      }
      val schema = "key LONG, version LONG, deleted BOOLEAN, prio STRING, cents LONG"
      val changes = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(landing)
        .select($"key", $"version", $"deleted",
          struct($"prio".as("_1"), $"cents".as("_2")).as("value"))
        .as[graft.streaming.Change[Long, (String, Long)]]
      val mat = graft.streaming.CdcApply.latestByKey(changes)
      // ~2k keys: size state partitions to cardinality (see q104)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = mat.toDF().writeStream.format("memory").queryName("gq105_sink")
          .outputMode("update").start()
        q.processAllAvailable()
        q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("version").desc)
      s.table("gq105_sink")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1 && !$"deleted")
        .groupBy($"value._1".as("prio"))
        .agg(count(lit(1)).as("cnt"), sum($"value._2").as("cents"))
        .orderBy("prio")
    },
    Some("""SELECT o_orderpriority AS prio, count(*) AS cnt,
                   CAST(sum(CASE WHEN o_orderkey % 3 = 0
                                 THEN 2 * CAST(floor(o_totalprice * 100) AS BIGINT)
                                 ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS cents
            FROM orders WHERE o_orderkey < 2000 AND o_orderkey % 5 <> 0
            GROUP BY 1 ORDER BY prio"""),
  )

  val all: Seq[GraftQuery] = Seq(q30, q30b, q30c, q31, q32, q33, q34, q35, q35b, q35c, q36, q36b, q36c, q37, q39, q98, q98b, q98c, q100, q101, q102, q103, q104, q105)
}
