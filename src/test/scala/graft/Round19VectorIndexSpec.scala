package graft

/** Round 19: `INDEX … TYPE vector_similarity('hnsw', '<distance>')`
  * (CH 24.8+) mapped onto the stored-IVF layout
  * ([[graft.plans.VectorIndex]]). Pins: DDL declaration (CREATE body
  * and ALTER ADD INDEX), MATERIALIZE INDEX building the
  * cell-partitioned sibling layout, the ANN probe rewrite with
  * plan-asserted partition pruning, exactness at full probe width,
  * staleness fallback after inserts, and every refusal contract. */
class Round19VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def mkVec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  private def landRows(table: String, n: Int): Unit = {
    (0 until n).map(i => (i.toLong, mkVec(i))).toDF("id", "vec")
      .createOrReplaceTempView(s"${table}_src")
    spark.sql(s"INSERT INTO $table SELECT id, vec FROM ${table}_src")
  }

  private def createIndexed(table: String): Unit = {
    dropWithLocation(table)
    spark.sql(
      s"""CREATE TABLE $table (
         |  id UInt64,
         |  vec Array(Float32),
         |  INDEX ann vec TYPE vector_similarity('hnsw', 'cosineDistance') GRANULARITY 4
         |) ENGINE = MergeTree ORDER BY id""".stripMargin)
  }

  private val probeLit = mkVec(9999).map(v => f"$v%.6f").mkString("[", ", ", "]")

  test("CREATE-body index declares; MATERIALIZE builds; probe prunes partitions in-plan") {
    createIndexed("vt1")
    landRows("vt1", 400)
    val built = spark.sql("ALTER TABLE vt1 MATERIALIZE INDEX ann").head().getLong(0)
    assert(built == 400L)
    spark.conf.set("spark.graft.vector.nprobe", "3")
    try {
      val df = spark.sql(s"SELECT id FROM vt1 ORDER BY cosineDistance(vec, $probeLit) LIMIT 5")
      // the cell IN (…) conjunct must be a PARTITION filter on the
      // physical scan — pruning at the file index, not a row filter
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail(s"no file scan in:\n${df.queryExecution.executedPlan}"))
      assert(scan.metadata("Location").contains("__graft_vecidx_ann"),
        "the probe must scan the IVF layout, not the base table")
      assert(scan.metadata("PartitionFilters").contains("cell"),
        s"cell conjunct must prune as a partition filter: ${scan.metadata("PartitionFilters")}")
      assert(df.collect().length == 5)
      // executed: ≤ nprobe cell directories actually read (one file
      // per cell by the ivfWrite layout)
      assert(scan.metrics("numFiles").value <= 3,
        s"probe read ${scan.metrics("numFiles").value} files, nprobe=3")
    } finally spark.conf.unset("spark.graft.vector.nprobe")
    spark.sql("DROP TABLE vt1")
  }

  test("full probe width reproduces the exact top-k") {
    createIndexed("vt2")
    landRows("vt2", 300)
    spark.sql("ALTER TABLE vt2 MATERIALIZE INDEX ann")
    // reference: the same data in a plain (non-indexed) table — the
    // probe rewrite cannot fire there, so this is the exact scan
    dropWithLocation("vt2_ref")
    spark.sql("CREATE TABLE vt2_ref (id UInt64, vec Array(Float32)) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO vt2_ref SELECT id, vec FROM vt2_src")
    spark.conf.set("spark.graft.vector.nprobe", "100000")
    try {
      val got = spark.sql(s"SELECT id FROM vt2 ORDER BY cosineDistance(vec, $probeLit) LIMIT 7")
        .collect().map(_.getLong(0)).toSeq
      val want = spark.sql(s"SELECT id FROM vt2_ref ORDER BY cosineDistance(vec, $probeLit) LIMIT 7")
        .collect().map(_.getLong(0)).toSeq
      assert(got == want)
    } finally spark.conf.unset("spark.graft.vector.nprobe")
    spark.sql("DROP TABLE vt2"); spark.sql("DROP TABLE vt2_ref")
  }

  test("inserts after MATERIALIZE make the index stale: probe falls back to the exact scan") {
    createIndexed("vt3")
    landRows("vt3", 200)
    spark.sql("ALTER TABLE vt3 MATERIALIZE INDEX ann")
    spark.sql("INSERT INTO vt3 SELECT 10001 AS id, vec FROM vt3_src LIMIT 1")
    val df = spark.sql(s"SELECT id FROM vt3 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(!df.inputFiles.exists(_.contains("__graft_vecidx")),
      "a stale index must not serve the probe")
    assert(df.collect().length == 3)
    // re-MATERIALIZE re-pins
    spark.sql("ALTER TABLE vt3 MATERIALIZE INDEX ann")
    val df2 = spark.sql(s"SELECT id FROM vt3 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(df2.inputFiles.forall(_.contains("__graft_vecidx_ann")))
    spark.sql("DROP TABLE vt3")
  }

  test("distance mismatch and SELECT * both fall through to the exact scan") {
    createIndexed("vt4")
    landRows("vt4", 100)
    spark.sql("ALTER TABLE vt4 MATERIALIZE INDEX ann")
    val l2 = spark.sql(s"SELECT id FROM vt4 ORDER BY L2Distance(vec, $probeLit) LIMIT 3")
    assert(!l2.inputFiles.exists(_.contains("__graft_vecidx")),
      "an index declared for cosineDistance must not serve an L2Distance probe")
    val star = spark.sql(s"SELECT * FROM vt4 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(!star.inputFiles.exists(_.contains("__graft_vecidx")))
    assert(star.columns.toSeq == Seq("id", "vec"), "no layout column may leak")
    spark.sql("DROP TABLE vt4")
  }

  test("ALTER ADD INDEX declares (IF NOT EXISTS honored; duplicates refuse); DROP removes the layout") {
    dropWithLocation("vt5")
    spark.sql("CREATE TABLE vt5 (id UInt64, vec Array(Float32)) ENGINE = MergeTree ORDER BY id")
    landRows("vt5", 120)
    spark.sql("ALTER TABLE vt5 ADD INDEX ann2 vec TYPE vector_similarity('hnsw', 'cosineDistance')")
    val dup = intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE vt5 ADD INDEX ann2 vec TYPE vector_similarity('hnsw', 'cosineDistance')"))
    assert(dup.getMessage.contains("already exists"))
    spark.sql("ALTER TABLE vt5 ADD INDEX IF NOT EXISTS ann2 vec TYPE vector_similarity('hnsw', 'cosineDistance')")
    spark.sql("ALTER TABLE vt5 MATERIALIZE INDEX ann2")
    val probed = spark.sql(s"SELECT id FROM vt5 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(probed.inputFiles.forall(_.contains("__graft_vecidx_ann2")))
    spark.sql("ALTER TABLE vt5 DROP INDEX ann2")
    val after = spark.sql(s"SELECT id FROM vt5 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(!after.inputFiles.exists(_.contains("__graft_vecidx")))
    val gone = intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE vt5 MATERIALIZE INDEX ann2"))
    assert(gone.getMessage.contains("does not exist"))
    spark.sql("ALTER TABLE vt5 DROP INDEX IF EXISTS ann2") // no-op, no throw
    spark.sql("DROP TABLE vt5")
  }

  test("non-mappable settings refuse at DDL time with guidance") {
    dropWithLocation("vt6")
    // quantization other than full precision
    val q = intercept[UnsupportedOperationException](spark.sql(
      """CREATE TABLE vt6 (id UInt64, vec Array(Float32),
        |INDEX a vec TYPE vector_similarity('hnsw', 'cosineDistance', 'i8'))
        |ENGINE = MergeTree ORDER BY id""".stripMargin))
    assert(q.getMessage.contains("quantize") || q.getMessage.contains("q59"), q.getMessage)
    // hnsw graph parameters
    val h = intercept[UnsupportedOperationException](spark.sql(
      """CREATE TABLE vt6 (id UInt64, vec Array(Float32),
        |INDEX a vec TYPE vector_similarity('hnsw', 'cosineDistance', 'f32', 64, 256))
        |ENGINE = MergeTree ORDER BY id""".stripMargin))
    assert(h.getMessage.contains("nprobe"), h.getMessage)
    // unknown distance
    val d = intercept[UnsupportedOperationException](spark.sql(
      """CREATE TABLE vt6 (id UInt64, vec Array(Float32),
        |INDEX a vec TYPE vector_similarity('hnsw', 'dotProduct'))
        |ENGINE = MergeTree ORDER BY id""".stripMargin))
    assert(d.getMessage.contains("cosineDistance"), d.getMessage)
    // a failed CREATE must not leave a half-created table behind
    assert(!spark.catalog.tableExists("vt6"))
    // skip indexes via ALTER refuse with the parquet-stats story
    dropWithLocation("vt7")
    spark.sql("CREATE TABLE vt7 (id UInt64, v String) ENGINE = MergeTree ORDER BY id")
    val s = intercept[UnsupportedOperationException](
      spark.sql("ALTER TABLE vt7 ADD INDEX bf v TYPE bloom_filter GRANULARITY 4"))
    assert(s.getMessage.contains("parquet"), s.getMessage)
    // non-vector column refuses at declaration
    val c = intercept[IllegalArgumentException](
      spark.sql("ALTER TABLE vt7 ADD INDEX a v TYPE vector_similarity('hnsw', 'cosineDistance')"))
    assert(c.getMessage.contains("Array(Float32"), c.getMessage)
    spark.sql("DROP TABLE vt7")
  }

  test("SHOW CREATE TABLE re-emits the vector index and the DDL re-executes") {
    createIndexed("vt9")
    val ddl = spark.sql("SHOW CREATE TABLE vt9").head().getString(0)
    assert(ddl.contains("INDEX ann vec TYPE vector_similarity('hnsw', 'cosineDistance')"), ddl)
    spark.sql("DROP TABLE vt9")
    // the emitted DDL is re-executable and re-declares the index
    spark.sql(ddl)
    landRows("vt9", 80)
    spark.sql("ALTER TABLE vt9 MATERIALIZE INDEX ann")
    val probed = spark.sql(s"SELECT id FROM vt9 ORDER BY cosineDistance(vec, $probeLit) LIMIT 3")
    assert(probed.inputFiles.forall(_.contains("__graft_vecidx_ann")))
    spark.sql("DROP TABLE vt9")
  }

  test("DROP TABLE cleans up sibling layout dirs (vector indexes AND projections)") {
    createIndexed("vt10")
    landRows("vt10", 60)
    spark.sql("ALTER TABLE vt10 MATERIALIZE INDEX ann")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val sib = new java.io.File(wh, "vt10__graft_vecidx_ann")
    assert(sib.exists, s"expected the IVF sibling at $sib")
    spark.sql("DROP TABLE vt10")
    assert(!spark.catalog.tableExists("vt10"))
    assert(!sib.exists, "DROP TABLE must not orphan the index layout")
    // projections ride the same cleanup
    dropWithLocation("vt11")
    spark.sql("CREATE TABLE vt11 (id UInt64, v Float64) ENGINE = MergeTree ORDER BY id")
    spark.sql("INSERT INTO vt11 VALUES (1, 1.5), (2, 2.5)")
    spark.sql("ALTER TABLE vt11 ADD PROJECTION psum (SELECT id, sum(v) GROUP BY id)")
    val psib = new java.io.File(wh, "vt11__graft_proj_psum")
    assert(psib.exists)
    spark.sql("DROP TABLE vt11")
    assert(!psib.exists, "DROP TABLE must not orphan the projection layout")
    // native behaviors untouched: IF EXISTS on a missing name is a
    // no-op; a missing name without it fails loudly
    spark.sql("DROP TABLE IF EXISTS vt10")
    val e = intercept[Exception](spark.sql("DROP TABLE vt10_nope").collect())
    assert(e.getMessage != null)
  }

  test("system.data_skipping_indices lists declared and built vector indexes") {
    createIndexed("vt12")
    val declared = spark.sql(
      "SELECT type, expr, data_compressed_bytes FROM system.data_skipping_indices WHERE table = 'vt12'")
      .collect()
    assert(declared.length == 1)
    assert(declared.head.getString(0) == "vector_similarity" &&
      declared.head.getString(1) == "vec" && declared.head.getLong(2) == 0L)
    landRows("vt12", 100)
    spark.sql("ALTER TABLE vt12 MATERIALIZE INDEX ann")
    val built = spark.sql(
      "SELECT data_compressed_bytes FROM system.data_skipping_indices WHERE table = 'vt12'")
      .head().getLong(0)
    assert(built > 0L, "a built index must report its layout bytes")
    spark.sql("DROP TABLE vt12")
    assert(spark.sql(
      "SELECT * FROM system.data_skipping_indices WHERE table = 'vt12'").collect().isEmpty)
  }

  test("skip-index entries in a CREATE body still strip silently (schema baggage)") {
    dropWithLocation("vt8")
    spark.sql(
      """CREATE TABLE vt8 (id UInt64, v String,
        |INDEX mm id TYPE minmax GRANULARITY 1)
        |ENGINE = MergeTree ORDER BY id""".stripMargin)
    assert(spark.table("vt8").columns.toSeq == Seq("id", "v"))
    spark.sql("DROP TABLE vt8")
  }
}
