package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.operators.{MatView, Replicate}
import graft.sources.{MergeTreeWrite, Tables}

/** The reference's WHOLE migration story as one pipeline — what a
  * user of ClickHouse/clickhouse.build actually does end to end
  * (/root/reference/src/tools/data_migrator.py + the emitted corpus
  * SQL in src/corpus/orm_none.txt):
  *
  *   Postgres-shaped source (embedded Derby over a real JDBC URL)
  *     → parallel snapshot with ClickPipe column mapping
  *     → MergeTree-shaped landing (month partitions, sorted rows)
  *     → the migrated app's ClickHouse SQL runs VERBATIM on it
  *       (toStartOfMonth, countIf, if(empty(…)), quantile(0.5)(x))
  *     → an incrementally-maintained materialized view answers the
  *       dashboard query from partial states.
  *
  * Every stage's output is asserted against values computed directly
  * from the inserted rows, so the spec certifies the composition —
  * not just each operator in isolation. */
class MigrationE2ESpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftmig;create=true"

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  // 180 expenses over six months of 2024; category NULL on every 5th
  // row (lands as '' in a migrated non-Nullable String column — the
  // exact case the corpus' if(empty(category), …) guards)
  private val months = Seq("01", "02", "03", "04", "05", "06")

  override def beforeAll(): Unit = {
    super.beforeAll()
    System.setProperty("derby.system.home", "/tmp")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate(
      """CREATE TABLE expenses (
        |  id BIGINT PRIMARY KEY,
        |  amount DOUBLE NOT NULL,
        |  category VARCHAR(24),
        |  created_at TIMESTAMP NOT NULL)""".stripMargin)
    val ins = conn.prepareStatement("INSERT INTO expenses VALUES (?, ?, ?, ?)")
    for (i <- 0 until 180) {
      val m = months(i % 6)
      ins.setLong(1, i.toLong)
      ins.setDouble(2, 10.0 + (i % 37))
      if (i % 5 == 0) ins.setNull(3, java.sql.Types.VARCHAR)
      else ins.setString(3, Seq("food", "travel", "office")(i % 3))
      ins.setTimestamp(4, java.sql.Timestamp.valueOf(s"2024-$m-${10 + i % 15} 12:00:00"))
      ins.addBatch()
    }
    ins.executeBatch()
    st.close(); conn.close()
  }

  test("snapshot → MergeTree landing → verbatim corpus SQL → materialized view") {
    // 1. parallel partitioned snapshot with the ClickPipe column map
    //    (rename/derive; NULL category → '' like a non-Nullable String)
    val snap = Replicate.snapshot(
      Tables.jdbcSnapshot(spark, url, "expenses", "id", lowerBound = 0L, upperBound = 180L,
        numPartitions = 4, props),
      Seq(
        "expense_id" -> col("ID"),
        "amount"     -> col("AMOUNT"),
        "category"   -> coalesce(col("CATEGORY"), lit("")),
        "created_at" -> col("CREATED_AT")))
    assert(snap.rdd.getNumPartitions == 4) // genuinely parallel read
    assert(snap.count() == 180)

    // 2. MergeTree-shaped landing: month partitions, ORDER BY-sorted
    val root = java.nio.file.Files.createTempDirectory("graft_mig").resolve("expenses").toString
    MergeTreeWrite.write(snap, root,
      partitionExprs = Seq("month" -> date_format(col("created_at"), "yyyy-MM")),
      orderBy = Seq("created_at", "expense_id"))
    val landed = spark.read.parquet(root)
    landed.createOrReplaceTempView("expenses")
    assert(landed.count() == 180)
    // one-month query prunes to ONE partition directory
    val pruned = landed.where(col("month") === "2024-03")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() == 30)

    // 3. the migrated app's ClickHouse SQL, VERBATIM (corpus shapes:
    //    monthly rollup + uncategorized guard + parametric quantile)
    val monthly = spark.sql(
      """SELECT toStartOfMonth(created_at) AS month,
        |       count(*) AS cnt,
        |       round(sum(amount), 2) AS total,
        |       countIf(if(empty(category), 'Uncategorized', category) = 'Uncategorized') AS n_uncat,
        |       quantile(0.5)(amount) AS med
        |FROM expenses GROUP BY toStartOfMonth(created_at) ORDER BY month""".stripMargin).collect()
    assert(monthly.length == 6)
    assert(monthly.map(_.getLong(1)).forall(_ == 30L))
    assert(monthly.map(_.getLong(3)).forall(_ == 6L)) // every 5th row uncategorized
    val catTotals = spark.sql(
      """SELECT if(empty(category), 'Uncategorized', category) AS cat,
        |       round(sum(amount), 2) AS total
        |FROM expenses GROUP BY cat ORDER BY cat""".stripMargin).collect()
    assert(catTotals.map(_.getString(0)).toSeq ==
      Seq("Uncategorized", "food", "office", "travel"))
    // cross-check one number directly from the insert arithmetic
    val uncatExpected = (0 until 180).filter(_ % 5 == 0).map(i => 10.0 + (i % 37)).sum
    assert(math.abs(catTotals.head.getDouble(1) - uncatExpected) < 1e-6)

    // 4. the dashboard MV: monthly partial states, O(delta) refresh,
    //    merge-on-read equals the direct rollup
    val mv = MatView.spec(Seq("month"),
      MatView.countState("cnt"),
      MatView.sumState("total", round(col("amount"), 2)))
    val store = java.nio.file.Files.createTempDirectory("graft_mig_mv").resolve("mv").toString
    val (init, delta) = (landed.where(col("month") < "2024-06"), landed.where(col("month") === "2024-06"))
    MatView.init(init, mv, store)
    MatView.refresh(delta, mv, store)
    val mvRows = MatView.read(spark, mv, store).orderBy("month").collect()
    val direct = landed.groupBy("month")
      .agg(count(lit(1)).as("cnt"), sum(round(col("amount"), 2)).as("total"))
      .orderBy("month").collect()
    assert(mvRows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }
}
