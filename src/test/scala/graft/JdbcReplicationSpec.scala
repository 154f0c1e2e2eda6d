package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Replicate
import graft.sources.Tables

/** End-to-end replication pipeline against a REAL JDBC database —
  * embedded Derby (ships with Spark), in-memory so the suite stays
  * hermetic. This is the ClickPipe story proven as a pipeline, not a
  * signature (reference: /root/reference/src/tools/data_migrator.py:
  * 14-105 — SNAPSHOT, then CDC_ONLY incremental pulls applied as
  * ReplacingMergeTree-with-tombstones):
  *
  *   1. `Tables.jdbcSnapshot` — parallel partitioned JDBC read
  *      (4 stride partitions on the numeric PK).
  *   2. `Replicate.incrementalPull` over a changelog table — the
  *      watermark predicate must PUSH DOWN to the JDBC scan, so each
  *      pull reads O(new rows) at the source, not the full log.
  *   3. `Replicate.applyCdc` — snapshot ∪ pulled changes, latest
  *      version per key wins, delete tombstones drop keys.
  *   4. The materialized state must equal the live source table read
  *      back directly — the invariant replication exists to provide.
  */
class JdbcReplicationSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftrepl;create=true"

  private def props: Properties = {
    val p = new Properties()
    // Derby 10.15+ ships EmbeddedDriver in derbytools.jar
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.system.home", "/tmp")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE customers (
        |  id BIGINT PRIMARY KEY,
        |  name VARCHAR(32) NOT NULL,
        |  balance DOUBLE NOT NULL,
        |  version BIGINT NOT NULL)""".stripMargin)
    st.executeUpdate(
      """CREATE TABLE customers_cdc (
        |  seq BIGINT PRIMARY KEY,
        |  op CHAR(1) NOT NULL,
        |  id BIGINT NOT NULL,
        |  name VARCHAR(32),
        |  balance DOUBLE,
        |  version BIGINT NOT NULL)""".stripMargin)

    // initial state: 100 customers, version 1; changelog seq 1..100
    val ins = conn.prepareStatement("INSERT INTO customers VALUES (?, ?, ?, ?)")
    val log = conn.prepareStatement("INSERT INTO customers_cdc VALUES (?, ?, ?, ?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i.toLong); ins.setString(2, s"cust_$i")
      ins.setDouble(3, i * 10.0); ins.setLong(4, 1L); ins.addBatch()
      log.setLong(1, i.toLong); log.setString(2, "I"); log.setLong(3, i.toLong)
      log.setString(4, s"cust_$i"); log.setDouble(5, i * 10.0); log.setLong(6, 1L); log.addBatch()
    }
    ins.executeBatch(); log.executeBatch()
    st.close(); ins.close(); log.close(); conn.close()
  }

  /** Read the live source table back, lower-cased columns (Derby
    * uppercases identifiers; the pipeline keys on lowercase names). */
  private def liveSource: DataFrame =
    spark.read.jdbc(url, "customers", props)
      .select(col("ID").as("id"), col("NAME").as("name"),
              col("BALANCE").as("balance"), col("VERSION").as("version"))

  private def changelog: DataFrame =
    spark.read.jdbc(url, "customers_cdc", props)
      .select(col("SEQ").as("seq"), col("OP").as("op"), col("ID").as("id"),
              col("NAME").as("name"), col("BALANCE").as("balance"), col("VERSION").as("version"))

  test("jdbcSnapshot reads the source in parallel stride partitions") {
    val snap = Tables.jdbcSnapshot(spark, url, "customers", "id", 1L, 100L, 4, props)
    assert(snap.rdd.getNumPartitions == 4)
    assert(snap.count() == 100)
    // partitioned read must not duplicate or drop boundary rows
    assert(snap.select(countDistinct(col("ID"))).head().getLong(0) == 100)
  }

  test("snapshot -> incremental pull -> applyCdc equals the live source state") {
    // ---- 1. snapshot (watermark = max seq covered by the snapshot)
    val snapshot = Tables.jdbcSnapshot(spark, url, "customers", "id", 1L, 100L, 4, props)
      .select(col("ID").as("id"), col("NAME").as("name"),
              col("BALANCE").as("balance"), col("VERSION").as("version"))
    val snapshotWm = 100L

    // ---- 2. source keeps moving: updates, new inserts, deletes
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    // update customers 1..10 to version 2
    (1 to 10).foreach { i =>
      st.executeUpdate(s"UPDATE customers SET balance = ${i * 100.0}, version = 2 WHERE id = $i")
      st.executeUpdate(s"INSERT INTO customers_cdc VALUES (${100 + i}, 'U', $i, 'cust_$i', ${i * 100.0}, 2)")
    }
    // insert customers 101..110
    (101 to 110).foreach { i =>
      st.executeUpdate(s"INSERT INTO customers VALUES ($i, 'cust_$i', ${i * 10.0}, 1)")
      st.executeUpdate(s"INSERT INTO customers_cdc VALUES (${10 + i}, 'I', $i, 'cust_$i', ${i * 10.0}, 1)")
    }
    // delete customers 50..59 (tombstones in the log)
    (50 to 59).foreach { i =>
      st.executeUpdate(s"DELETE FROM customers WHERE id = $i")
      st.executeUpdate(s"INSERT INTO customers_cdc VALUES (${71 + i}, 'D', $i, NULL, NULL, 3)")
    }
    st.close(); conn.close()

    // ---- 3. incremental pull: only rows past the watermark, and the
    // predicate must reach the JDBC source as a pushed filter.
    val (pulled, wmAgg) = Replicate.incrementalPull(changelog, "seq", Some(lit(snapshotWm)))
    val plan = pulled.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"watermark predicate did not push down to the JDBC scan:\n$plan")
    assert(pulled.count() == 30)
    val newWm = pulled.agg(wmAgg.as("wm")).head().getLong(0)
    assert(newWm == 130L)

    // ---- 4. apply: snapshot rows rank below every pulled change
    // (seq 0), latest change per key wins, deletes drop the key.
    val base = snapshot
      .withColumn("seq", lit(0L)).withColumn("op", lit("I"))
      .select("seq", "op", "id", "name", "balance", "version")
    val state = Replicate.applyCdc(
        base.unionByName(pulled.select("seq", "op", "id", "name", "balance", "version")),
        keyCols = Seq("id"),
        orderCols = Seq(col("seq")),
        isDelete = trim(col("op")) === "D")
      .select("id", "name", "balance", "version")

    // ---- 5. invariant: materialized state == live source table
    val got = state.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val want = liveSource.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 100) // 100 + 10 inserted - 10 deleted
    assert(got.sameElements(want))

    // ---- 6. next pull from the new watermark is empty (no re-reads)
    val (empty, _) = Replicate.incrementalPull(changelog, "seq", Some(lit(newWm)))
    assert(empty.isEmpty)
  }
}
