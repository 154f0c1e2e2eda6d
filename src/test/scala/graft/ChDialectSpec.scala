package graft

import org.apache.spark.sql.functions._

/** The reference's migrated app code emits ClickHouse-dialect SQL
  * (corpus orm_none.txt:483-489); these specs run that SQL verbatim
  * through spark.sql and check it against DataFrame equivalents. */
class ChDialectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val view: Unit = {
    val base = java.sql.Timestamp.valueOf("2026-01-15 00:00:00")
    Seq.tabulate(300) { i =>
      (new java.sql.Timestamp(base.getTime + i.toLong * 86400000 / 4),
       (i % 7).toLong, i.toDouble, if (i % 3 == 0) "purchase" else "view",
       s"""{"k": ${i % 10}}""")
    }.toDF("date", "user_id", "amount", "etype", "props")
      .createOrReplaceTempView("expenses")
  }

  test("the corpus' canonical monthly rollup runs verbatim") {
    view
    val out = spark.sql(
      """SELECT toStartOfMonth(date) as month,
               count(*) as count,
               sum(amount) as total
         FROM expenses
         GROUP BY toStartOfMonth(date)
         ORDER BY month DESC""").collect()
    assert(out.length == 3) // Jan, Feb, Mar
    assert(out.map(_.getLong(1)).sum == 300L)
  }

  test("conditional/argMax/uniq/JSON dialect functions resolve natively") {
    view
    val r = spark.sql(
      """SELECT countIf(etype = 'purchase') AS p,
               sumIf(amount, etype = 'purchase') AS pv,
               argMax(etype, amount) AS last_type,
               uniq(user_id) AS u,
               JSONExtractInt(props, 'k') AS k
         FROM expenses GROUP BY JSONExtractInt(props, 'k')
         ORDER BY k LIMIT 1""").head()
    assert(r.getLong(0) == 10L)               // i % 10 == 0 && i % 3 == 0 → 10 of 30
    assert(r.getLong(3) == 7L)                // HLL exact at tiny cardinality
    assert(r.getLong(4) == 0L)
    // plan stays native: no UDFs, aggregate is partial-aggregable
    val plan = spark.sql("SELECT countIf(etype='purchase') FROM expenses")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("partial_count"))
  }
}
