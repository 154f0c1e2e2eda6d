package graft

/** The pure-SQL migration path a ClickHouse user would take — no
  * Scala operator calls, only spark.sql with the dialect layer:
  * CH CREATE TABLE DDL → INSERT from a file() landing → ClickHouse
  * analytics (parametric aggregates, countIf, quantile) → CREATE
  * MATERIALIZED VIEW → query the MV. Complements MigrationE2ESpec,
  * which certifies the operator-level story. */
class SqlOnlyMigrationSpec extends SparkSpec {

  test("DDL -> file() load -> CH analytics -> MV, SQL only") {
    val dir = s"/tmp/graft_sqlmig_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.range(1000).selectExpr(
      "id AS event_id", "id % 17 AS user_id",
      "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 THEN 'click' ELSE 'purchase' END AS event_type",
      "CAST(id % 97 AS DOUBLE) AS amount").write.parquet(dir)
    try {
      spark.sql("DROP VIEW IF EXISTS mig_daily")
      spark.sql("DROP TABLE IF EXISTS mig_events")
      // 1. verbatim CH DDL
      spark.sql("""
        CREATE TABLE mig_events (
          event_id UInt64,
          user_id UInt32,
          event_type LowCardinality(String),
          amount Nullable(Float64)
        ) ENGINE = MergeTree() ORDER BY (user_id, event_id)
        SETTINGS index_granularity = 8192""")
      // 2. load through the file() table function
      spark.sql(s"INSERT INTO mig_events SELECT * FROM file('$dir', 'Parquet')")
      // 3. ClickHouse-dialect analytics on the landed table
      val r = spark.sql("""
        SELECT event_type,
               count() AS cnt,
               countIf(amount > 50) AS big,
               round(quantile(0.5)(amount), 2) AS p50,
               uniqExact(user_id) AS users
        FROM mig_events GROUP BY event_type ORDER BY event_type""").collect()
      assert(r.length == 3)
      assert(r.map(_.getLong(1)).sum == 1000L)
      assert(r.forall(_.getLong(4) == 17L))
      // 4. materialized view over it, queried like a table
      spark.sql("""
        CREATE MATERIALIZED VIEW mig_daily ENGINE = SummingMergeTree ORDER BY user_id
        AS SELECT user_id, sum(amount) AS spend, count() AS n
           FROM mig_events WHERE event_type = 'purchase' GROUP BY user_id""")
      val mv = spark.sql("SELECT sum(spend), sum(n) FROM mig_daily").head()
      val direct = spark.sql(
        "SELECT sum(amount), count() FROM mig_events WHERE event_type = 'purchase'").head()
      assert(mv.getDouble(0) == direct.getDouble(0) && mv.getLong(1) == direct.getLong(1))
    } finally {
      spark.sql("DROP VIEW IF EXISTS mig_daily")
      spark.sql("DROP TABLE IF EXISTS mig_events")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
