package graft

import graft.operators.Dictionaries

/** `CREATE TABLE … ENGINE = Join` + joinGet/joinGetOrNull: the
  * Join-engine lookup surface riding the dictionary broadcast-join
  * rewrite. */
class JoinEngineSpec extends SparkSpec {

  private def drop(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    Dictionaries.unregisterJoinTable(n)
  }

  test("column-form DDL + joinGet returns the value, default on miss") {
    drop("je_rates")
    spark.sql("CREATE TABLE je_rates (cur String, rate Float64) ENGINE = Join(ANY, LEFT, cur)")
    spark.sql("INSERT INTO je_rates VALUES ('EUR', 1.1), ('GBP', 1.3)")
    val r = spark.sql(
      """SELECT cur, joinGet('je_rates', 'rate', cur) AS rate,
                joinGetOrNull('je_rates', 'rate', cur) AS rate_n
         FROM VALUES ('EUR'), ('XXX') AS t(cur) ORDER BY cur""").collect()
      .map(row => (row.getDouble(1), row))
    assert(r(0)._1 == 1.1 && r(0)._2.getDouble(2) == 1.1)
    assert(r(1)._1 == 0.0)      // joinGet: type default on miss
    assert(r(1)._2.isNullAt(2)) // joinGetOrNull: NULL on miss
    drop("je_rates")
  }

  test("AS-SELECT form; ANY keeps one deterministic row per key") {
    drop("je_any")
    spark.sql(
      """CREATE TABLE je_any ENGINE = Join(ANY, LEFT, k) AS
         SELECT * FROM VALUES (1, 'b'), (1, 'a'), (2, 'z') AS t(k, v)""")
    // ANY resolves duplicates to the row sorting first over non-key
    // columns — 'a' for k=1, independent of insert order
    val r = spark.sql(
      "SELECT k, joinGet('je_any', 'v', k) AS v FROM VALUES (1), (2), (3) AS p(k) ORDER BY k").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a", "z", ""))
    drop("je_any")
  }

  test("composite keys join every column") {
    drop("je_pair")
    spark.sql(
      """CREATE TABLE je_pair ENGINE = Join(ANY, LEFT, a, b) AS
         SELECT * FROM VALUES (1, 'x', 10L), (1, 'y', 20L) AS t(a, b, w)""")
    val r = spark.sql(
      """SELECT b, joinGet('je_pair', 'w', a, b) AS w
         FROM VALUES (1, 'y'), (1, 'z') AS p(a, b) ORDER BY b""").collect()
    assert(r(0).getLong(1) == 20L && r(1).getLong(1) == 0L)
    drop("je_pair")
  }

  test("joinGet refuses unknown tables, non-ANY tables, and bad key counts") {
    drop("je_all")
    spark.sql(
      """CREATE TABLE je_all ENGINE = Join(ALL, INNER, k) AS
         SELECT * FROM VALUES (1, 'a') AS t(k, v)""")
    def msg(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      def all(t: Throwable): String = if (t == null) "" else t.getMessage + all(t.getCause)
      all(e)
    }
    assert(msg("SELECT joinGet('no_such_join_table', 'v', 1)").contains("ENGINE = Join"))
    assert(msg("SELECT joinGet('je_all', 'v', 1)").contains("ANY LEFT JOIN"))
    drop("je_one")
    spark.sql("CREATE TABLE je_one ENGINE = Join(ANY, LEFT, k) AS SELECT 1 AS k, 'a' AS v")
    assert(msg("SELECT joinGet('je_one', 'v', 1, 2)").contains("key"))
    drop("je_all", "je_one")
  }

  test("Join-engine tables stay out of the dictionary listing; plan broadcasts") {
    drop("je_dim")
    spark.sql("CREATE TABLE je_dim ENGINE = Join(ANY, LEFT, k) AS SELECT 1 AS k, 'a' AS v")
    assert(!Dictionaries.list.exists(_._1.contains("je_dim")))
    val plan = spark.sql(
      "SELECT joinGet('je_dim', 'v', id) AS v FROM range(10)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"joinGet should plan a broadcast join:\n$plan")
    drop("je_dim")
  }

  test("ENGINE = Join validates its arguments at DDL time") {
    drop("je_bad")
    def msg(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql))
      def all(t: Throwable): String = if (t == null) "" else t.getMessage + all(t.getCause)
      all(e)
    }
    assert(msg("CREATE TABLE je_bad ENGINE = Join(ANY) AS SELECT 1 AS k")
      .contains("strictness"))
    assert(msg("CREATE TABLE je_bad ENGINE = Join(SOME, LEFT, k) AS SELECT 1 AS k")
      .contains("strictness"))
    // key column absent from the schema fails at DDL, not first joinGet
    assert(msg("CREATE TABLE je_bad ENGINE = Join(ANY, LEFT, nope) AS SELECT 1 AS k")
      .contains("nope"))
    drop("je_bad")
  }
}
