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

  /** Round 13: Postgres type-fidelity sweep. The reference's migrator
    * takes arbitrary PG schemas (data_migrator.py:23-28); this pins
    * the VALUE-EXACT round trip of the mainstream PG column shapes
    * through snapshot + CDC apply, on Derby analogs that exercise the
    * same JDBC metadata paths (mapping table: graft.sources.PgWire):
    * NUMERIC→Decimal (Derby's 31-digit ceiling; Spark handles 38),
    * TIMESTAMPTZ→Timestamp as a UTC instant at micros precision,
    * UUID→String (canonical 36 chars), JSONB→String (JSONExtract*
    * operates downstream), BYTEA→Binary byte-exact, and TEXT[] via
    * the PG array text-literal parser (PgWire.textArray) with quoted
    * elements, escapes and NULLs. */
  test("Postgres type shapes: NUMERIC/TIMESTAMPTZ/UUID/JSONB/BYTEA/TEXT[] round-trip snapshot + CDC") {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE pg_typed (
        |  id BIGINT PRIMARY KEY,
        |  amount DECIMAL(31,8) NOT NULL,
        |  created TIMESTAMP NOT NULL,
        |  uid CHAR(36) NOT NULL,
        |  payload VARCHAR(200) NOT NULL,
        |  blob_v VARCHAR(50) FOR BIT DATA NOT NULL,
        |  tags VARCHAR(100) NOT NULL)""".stripMargin)
    val ins = conn.prepareStatement("INSERT INTO pg_typed VALUES (?, ?, ?, ?, ?, ?, ?)")
    def put(id: Long, amount: String, createdMicros: Long, uid: String,
            payload: String, bytes: Array[Byte], tags: String): Unit = {
      ins.setLong(1, id)
      ins.setBigDecimal(2, new java.math.BigDecimal(amount))
      val ts = new java.sql.Timestamp(createdMicros / 1000)
      ts.setNanos(((createdMicros % 1000000) * 1000).toInt)
      ins.setTimestamp(3, ts, java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC")))
      ins.setString(4, uid); ins.setString(5, payload); ins.setBytes(6, bytes)
      ins.setString(7, tags); ins.executeUpdate()
    }
    // full-precision decimal (23 int digits + 8 frac), micros-precision
    // instant, canonical UUID, JSON text, raw bytes incl. zero/0xFF,
    // PG array literal with quoting, escapes and a NULL element
    put(1L, "12345678901234567890123.45678901", 1723629296123456L,
      "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
      """{"k": "v", "n": [1, 2]}""", Array[Byte](0, 1, -1, 127, -128),
      """{plain,"with space","qu\"ote","back\\slash",NULL,"NULL"}""")
    put(2L, "-0.00000001", 123456L, "00000000-0000-0000-0000-000000000000",
      "null", Array[Byte](), "{}")
    st.close(); ins.close(); conn.close()

    def readTyped: DataFrame = spark.read.jdbc(url, "pg_typed", props)
      .select(col("ID").as("id"), col("AMOUNT").as("amount"),
        col("CREATED").as("created"), col("UID").as("uid"),
        col("PAYLOAD").as("payload"), col("BLOB_V").as("blob_v"), col("TAGS").as("tags"))
    val snap = readTyped

    // -- schema mapping is the contract (PgWire table)
    val sch = snap.schema
    assert(sch("amount").dataType == org.apache.spark.sql.types.DecimalType(31, 8))
    assert(sch("created").dataType == org.apache.spark.sql.types.TimestampType)
    assert(sch("uid").dataType == org.apache.spark.sql.types.StringType)
    assert(sch("blob_v").dataType == org.apache.spark.sql.types.BinaryType)

    // -- CDC keeps moving: an update to row 1, a fresh insert 3
    val conn2 = DriverManager.getConnection(url)
    val st2 = conn2.createStatement()
    st2.executeUpdate(
      "UPDATE pg_typed SET amount = 1.5, payload = '{\"k\": \"v2\"}' WHERE id = 1")
    st2.executeUpdate(
      "INSERT INTO pg_typed VALUES (3, 42.00000001, TIMESTAMP('2026-02-03 04:05:06.789012'), " +
      "'11111111-2222-3333-4444-555555555555', '[]', X'CAFEBABE', '{a,b}')")
    st2.close(); conn2.close()

    // apply: snapshot (seq 0) + the changed rows re-read as CDC ops
    val changes = readTyped.where(col("id").isin(1L, 3L))
      .withColumn("seq", lit(1L)).withColumn("op", lit("U"))
    val state = Replicate.applyCdc(
        snap.withColumn("seq", lit(0L)).withColumn("op", lit("I")).unionByName(changes),
        keyCols = Seq("id"), orderCols = Seq(col("seq")),
        isDelete = col("op") === "D")
      .drop("seq", "op")

    // -- invariant: state == live table, value-exact per type
    val got = state.orderBy("id").collect()
    val want = readTyped.orderBy("id").collect()
    assert(got.length == 3)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.getDecimal(1).compareTo(w.getDecimal(1)) == 0, s"NUMERIC id=${g.getLong(0)}")
      assert(g.getTimestamp(2) == w.getTimestamp(2), s"TIMESTAMPTZ id=${g.getLong(0)}")
      assert(g.getString(3) == w.getString(3) && g.getString(4) == w.getString(4))
      assert(java.util.Arrays.equals(g.getAs[Array[Byte]](5), w.getAs[Array[Byte]](5)),
        s"BYTEA id=${g.getLong(0)}")
    }
    // decimal precision survived end to end (not truncated to double)
    val d1 = got(0).getDecimal(1)
    assert(d1.compareTo(new java.math.BigDecimal("1.50000000")) == 0)
    val micros = spark.createDataFrame(java.util.List.of(got(0)), state.schema)
      .select(expr("unix_micros(created)")).head().getLong(0)
    assert(micros == 1723629296123456L, "micros precision must survive the round trip")

    // -- TEXT[]: the PG array literal parses with quoting/escape/NULL rules
    val tags = state.where(col("id") === 1)
      .select(graft.sources.PgWire.textArray(col("tags"))).head().getSeq[String](0)
    assert(tags == Seq("plain", "with space", "qu\"ote", "back\\slash", null, "NULL"))
    assert(state.where(col("id") === 2)
      .select(graft.sources.PgWire.textArray(col("tags"))).head().getSeq[String](0).isEmpty)
    // JSONB text stays operable by the JSON family downstream
    assert(state.where(col("id") === 1)
      .selectExpr("get_json_object(payload, '$.k')").head().getString(0) == "v2")
  }
}
