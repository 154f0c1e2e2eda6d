package graft

/** Verbatim ClickHouse CREATE TABLE DDL running on spark.sql: the
  * ENGINE clause marks the dialect, column types map to Spark types,
  * layout hints (ORDER BY / TTL / SETTINGS) strip — their honored
  * path is MergeTreeWrite. Plain Spark DDL must never be touched. */
class ChDdlSpec extends SparkSpec {

  private def drop(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // an aborted prior run can leave the managed location behind,
    // which fails the next CREATE with LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      java.nio.file.Files.walk(loc.toPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("MergeTree DDL with the full type zoo creates a usable table") {
    drop("ddl_zoo")
    spark.sql("""
      CREATE TABLE ddl_zoo (
        id UInt64,
        name String,
        tag LowCardinality(String),
        score Nullable(Float64),
        born Date,
        seen DateTime64(3),
        flags Array(UInt8),
        attrs Map(String, Int64),
        pt Tuple(x Float64, y Float64),
        amount Decimal(12, 2),
        tiny Decimal32(4),
        ok Bool,
        uid UUID,
        fs FixedString(16),
        level Enum8('low' = 1, 'high' = 2)
      ) ENGINE = MergeTree()
      ORDER BY (id, born)
      TTL born + INTERVAL 30 DAY
      SETTINGS index_granularity = 8192""")
    val schema = spark.table("ddl_zoo").schema
    def dt(c: String) = schema(c).dataType.sql
    assert(dt("id") == "BIGINT" && dt("name") == "STRING" && dt("tag") == "STRING")
    assert(dt("score") == "DOUBLE" && dt("born") == "DATE" && dt("seen") == "TIMESTAMP")
    assert(dt("flags") == "ARRAY<SMALLINT>")
    assert(dt("attrs") == "MAP<STRING, BIGINT>")
    assert(dt("pt") == "STRUCT<x: DOUBLE, y: DOUBLE>")
    assert(dt("amount") == "DECIMAL(12,2)" && dt("tiny") == "DECIMAL(9,4)")
    assert(dt("ok") == "BOOLEAN" && dt("uid") == "STRING")
    assert(dt("fs") == "STRING" && dt("level") == "STRING")
    // the table is writable and readable through normal SQL
    spark.sql("""INSERT INTO ddl_zoo VALUES
      (1, 'a', 't', 0.5, date'2020-01-01', timestamp'2020-01-01 00:00:00',
       array(1, 2), map('k', 5L), struct(1.0D, 2.0D), 12.34, 1.2345, true,
       'u-1', 'fixed', 'low')""")
    assert(spark.sql("SELECT count(*) FROM ddl_zoo").head().getLong(0) == 1L)
    drop("ddl_zoo")
  }

  test("PARTITION BY bare columns survives; expression keys strip") {
    drop("ddl_part")
    spark.sql("""CREATE TABLE ddl_part (d Date, k UInt32, v String)
                 ENGINE = MergeTree PARTITION BY k ORDER BY d""")
    // round 16: DESCRIBE TABLE on an engine-recorded table answers
    // the CH shape — partition membership is the flag column
    val flags = spark.sql("DESCRIBE TABLE ddl_part").collect()
      .map(r => r.getString(0) -> r.getInt(5)).toMap
    assert(flags("k") == 1 && flags("d") == 0 && flags("v") == 0)
    // the PHYSICAL layout partitioned too (native DESCRIBE EXTENDED)
    val cat = spark.sql("DESCRIBE TABLE EXTENDED ddl_part").collect().map(_.getString(0))
    assert(cat.contains("# Partition Information"))
    drop("ddl_part")
    drop("ddl_expr")
    // expression partition key: table still creates, unpartitioned —
    // no column carries the flag (the expression resolves at relayout)
    spark.sql("""CREATE TABLE ddl_expr (d DateTime, v UInt64)
                 ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY d""")
    assert(spark.sql("DESCRIBE TABLE ddl_expr").collect().map(_.getInt(5)).sum == 0)
    assert(!spark.sql("DESCRIBE TABLE EXTENDED ddl_expr").collect()
      .map(_.getString(0)).contains("# Partition Information"))
    drop("ddl_expr")
  }

  test("IF NOT EXISTS, ReplacingMergeTree, and defaults/codecs strip") {
    drop("ddl_rep")
    spark.sql("""CREATE TABLE IF NOT EXISTS ddl_rep (
        k UInt64,
        v String DEFAULT 'x' CODEC(ZSTD),
        ver UInt64
      ) ENGINE = ReplacingMergeTree(ver) ORDER BY k""")
    spark.sql("CREATE TABLE IF NOT EXISTS ddl_rep (k UInt64) ENGINE = Memory")
    assert(spark.table("ddl_rep").schema.fieldNames.toSeq == Seq("k", "v", "ver"))
    drop("ddl_rep")
  }

  test("plain Spark DDL is untouched") {
    drop("ddl_plain")
    spark.sql("CREATE TABLE ddl_plain (a INT, b STRING) USING parquet")
    assert(spark.table("ddl_plain").schema.fieldNames.toSeq == Seq("a", "b"))
    drop("ddl_plain")
  }

  test("CREATE MATERIALIZED VIEW maps to a view; mutations refuse with pointers") {
    spark.sql("DROP VIEW IF EXISTS ddl_mv")
    spark.sql("DROP TABLE IF EXISTS ddl_mv_src")
    spark.sql("CREATE TABLE ddl_mv_src (k UInt32, v UInt64) ENGINE = MergeTree ORDER BY k")
    spark.sql("INSERT INTO ddl_mv_src VALUES (1, 10), (1, 20), (2, 5)")
    spark.sql("""CREATE MATERIALIZED VIEW ddl_mv ENGINE = SummingMergeTree ORDER BY k POPULATE
                 AS SELECT k, sum(v) AS s FROM ddl_mv_src GROUP BY k""")
    val r = spark.sql("SELECT * FROM ddl_mv ORDER BY k").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 30L), (2L, 5L)))
    spark.sql("DROP VIEW ddl_mv"); spark.sql("DROP TABLE ddl_mv_src")
    // mutations now execute — on a missing table they fail at catalog
    // resolution, not with a refusal message
    val e1 = intercept[Exception](spark.sql("ALTER TABLE no_such_t DELETE WHERE x = 1"))
    assert(e1.getMessage.toLowerCase.contains("table"))
  }

  private def partFileState(warehousePath: String): Map[String, (Long, Long)] = {
    val root = java.nio.file.Paths.get(warehousePath)
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    java.nio.file.Files.walk(root).forEach { p =>
      val f = p.toFile
      if (f.isFile && f.getName.endsWith(".parquet"))
        out(root.relativize(p).toString) = (f.length, f.lastModified)
    }
    out.toMap
  }

  test("ALTER TABLE DELETE/UPDATE execute as partition-pruned mutations from verbatim CH SQL") {
    drop("ddl_mut")
    spark.sql("""CREATE TABLE ddl_mut (id UInt64, p UInt32, owner String, v Float64)
                 ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    // partition column lands last in the table schema
    spark.sql("INSERT INTO ddl_mut SELECT id, concat('u', CAST(id % 10 AS STRING)), CAST(id AS DOUBLE), CAST(id % 4 AS INT) FROM range(400)")
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("ddl_mut"))
      .location.getPath
    val before = partFileState(loc)

    val del = spark.sql("ALTER TABLE ddl_mut DELETE WHERE p = 1 AND id < 100").head()
    assert(del.getLong(1) == 1L && del.getLong(2) == 25L) // 1 partition rewritten, 25 rows
    assert(spark.table("ddl_mut").count() == 375)
    assert(spark.sql("SELECT count(*) FROM ddl_mut WHERE p = 1 AND id < 100").head().getLong(0) == 0)
    // untouched partitions byte-identical on disk
    val afterDel = partFileState(loc)
    before.keys.filter(k => !k.contains("p=1")).foreach { k =>
      assert(afterDel(k) == before(k), s"$k was rewritten by an unrelated DELETE")
    }

    val upd = spark.sql(
      "ALTER TABLE ddl_mut UPDATE owner = 'redacted', v = v * 100 WHERE p = 2 AND v < 50").head()
    assert(upd.getLong(1) == 1L && upd.getLong(2) == 12L)
    assert(spark.sql("SELECT count(*) FROM ddl_mut WHERE owner = 'redacted'").head().getLong(0) == 12)
    assert(spark.sql("SELECT v FROM ddl_mut WHERE id = 2").head().getDouble(0) == 200.0)
    // non-matching row in the rewritten partition copied through
    assert(spark.sql("SELECT v FROM ddl_mut WHERE id = 50").head().getDouble(0) == 50.0)

    // a DELETE that empties a whole partition removes it entirely
    spark.sql("ALTER TABLE ddl_mut DELETE WHERE p = 3")
    assert(spark.sql("SELECT count(*) FROM ddl_mut WHERE p = 3").head().getLong(0) == 0)
    assert(spark.sql("SELECT count(DISTINCT p) FROM ddl_mut").head().getLong(0) == 3)

    // CH 23+ lightweight-delete spelling routes to the same path
    val lw = spark.sql("DELETE FROM ddl_mut WHERE p = 0 AND id >= 200").head()
    assert(lw.getLong(2) == 50L, s"lightweight delete rows: ${lw.getLong(2)}")
    assert(spark.sql("SELECT count(*) FROM ddl_mut WHERE p = 0 AND id >= 200").head().getLong(0) == 0)
    // bare DELETE FROM refuses with TRUNCATE guidance (CH requires WHERE)
    val bare = intercept[Exception](spark.sql("DELETE FROM ddl_mut"))
    assert(bare.getMessage.contains("TRUNCATE"))

    // CH 25.7+ lightweight UPDATE spelling routes to the mutate path
    val lwu = spark.sql("UPDATE ddl_mut SET owner = 'lw', v = v + 1 WHERE p = 2 AND id < 20").head()
    assert(lwu.getLong(2) > 0)
    assert(spark.sql("SELECT count(*) FROM ddl_mut WHERE owner = 'lw'").head().getLong(0) == lwu.getLong(2))
    val lwuBare = intercept[Exception](spark.sql("UPDATE ddl_mut SET v = 0"))
    assert(lwuBare.getMessage.contains("WHERE"))
    drop("ddl_mut")
  }

  test("OPTIMIZE TABLE compacts parts read-invariantly; DEDUPLICATE drops dup rows") {
    drop("ddl_opt")
    spark.sql("""CREATE TABLE ddl_opt (id UInt64, p UInt32, v Float64)
                 ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    // several small inserts → many files per partition (MergeTree parts)
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO ddl_opt SELECT id + ${b * 100}, CAST(id AS DOUBLE), CAST(id % 2 AS INT) FROM range(100)")
    }
    val sumBefore = spark.sql("SELECT sum(v), count(*) FROM ddl_opt").head()

    // PARTITION-scoped optimize compacts ONE directory; the other
    // partition's files stay byte-identical on disk
    val loc0 = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("ddl_opt"))
      .location.getPath
    val otherBefore = partFileState(loc0).filter(_._1.contains("p=1"))
    val rp = spark.sql("OPTIMIZE TABLE ddl_opt PARTITION '0' FINAL").head()
    assert(rp.getLong(1) < rp.getLong(0), s"files: ${rp.getLong(0)} -> ${rp.getLong(1)}")
    val otherAfter = partFileState(loc0).filter(_._1.contains("p=1"))
    assert(otherAfter == otherBefore, "PARTITION '0' optimize touched p=1 files")
    assert(spark.sql("SELECT sum(v), count(*) FROM ddl_opt").head() == sumBefore)
    // unconsumable PARTITION spellings refuse LOUDLY — a fall-through
    // would run a full-table optimize the user didn't ask for
    val tup = intercept[Exception](
      spark.sql("OPTIMIZE TABLE ddl_opt PARTITION tuple('0') FINAL"))
    assert(tup.getMessage.contains("PARTITION"))
    val par = intercept[Exception](
      spark.sql("OPTIMIZE TABLE ddl_opt PARTITION (0) FINAL"))
    assert(par.getMessage.contains("PARTITION"))
    val pid = intercept[Exception](
      spark.sql("OPTIMIZE TABLE ddl_opt PARTITION ID '0' FINAL"))
    assert(pid.getMessage.contains("PARTITION ID"))

    val r = spark.sql("OPTIMIZE TABLE ddl_opt FINAL").head()
    assert(r.getLong(1) < r.getLong(0), s"file count should drop: ${r.getLong(0)} -> ${r.getLong(1)}")
    assert(r.getLong(1) == 2L) // one file per partition
    val sumAfter = spark.sql("SELECT sum(v), count(*) FROM ddl_opt").head()
    assert(sumAfter == sumBefore) // read-invariant

    // DEDUPLICATE BY drops duplicate keys (we inserted id%2/v duplicated 4x per (p,v))
    spark.sql("OPTIMIZE TABLE ddl_opt FINAL DEDUPLICATE BY p, v")
    assert(spark.table("ddl_opt").count() == 100)
    drop("ddl_opt")

    // unpartitioned table compacts through the side-directory swap
    drop("ddl_opt0")
    spark.sql("CREATE TABLE ddl_opt0 (id UInt64, v Float64) ENGINE = MergeTree ORDER BY id")
    (0 until 3).foreach { _ =>
      spark.sql("INSERT INTO ddl_opt0 SELECT id, CAST(id AS DOUBLE) FROM range(50)")
    }
    val r0 = spark.sql("OPTIMIZE TABLE ddl_opt0").head()
    assert(r0.getLong(1) == 1L && r0.getLong(0) >= 3L)
    assert(spark.table("ddl_opt0").count() == 150)
    drop("ddl_opt0")
  }

  test("file() table function reads direct paths; s3/url map or refuse") {
    val dir = s"/tmp/graft_ddl_file_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.range(5).selectExpr("id", "id * 2 AS dbl").write.parquet(dir)
    assert(spark.sql(s"SELECT sum(dbl) FROM file('$dir', 'Parquet')").head().getLong(0) == 20L)
    // format inferred from the extension of a single file
    val one = spark.sql(s"SELECT count(*) FROM file('$dir/*.parquet')").head().getLong(0)
    assert(one == 5L)
    // s3 rewrites to the s3a connector scheme (parse-level check)
    val plan = spark.sessionState.sqlParser.parsePlan(
      "SELECT * FROM s3('s3://bucket/k.parquet', 'Parquet')")
    assert(plan.toString.contains("s3a://bucket/k.parquet"))
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM url('http://x/y.csv', 'CSV')"))
    assert(e1.getMessage.contains("egress"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM file('$dir', 'Native')"))
    assert(e2.getMessage.contains("Formats"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("url() reads file: URIs and allowlisted local http; egress refusal holds") {
    // file: scheme reads in place
    val d = java.nio.file.Files.createTempDirectory("graft_url").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "rows.json"),
      """{"k":"a","v":1}""" + "\n" + """{"k":"b","v":2}""")
    assert(spark.sql(s"SELECT sum(v) FROM url('file://$d/rows.json', 'JSONEachRow')")
      .head().getLong(0) == 3L)

    // loopback http serves a JSONEachRow fixture (JDK built-in server)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body = """{"k":"x","v":10}""" + "\n" + """{"k":"y","v":32}"""
    server.createContext("/data.json", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      // format inferred from the URL path extension
      assert(spark.sql(s"SELECT sum(v) FROM url('http://127.0.0.1:$port/data.json')")
        .head().getLong(0) == 42L)
    } finally server.stop(0)

    // non-loopback hosts still refuse (egress policy intact)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM url('https://example.com/x.csv', 'CSV')"))
    assert(e.getMessage.contains("egress"))
  }

  test("url() refuses redirects, fetches once per JVM, skips string literals; params refuse on commands") {
    // a loopback server that redirects — following it could leave the
    // allowlist, so the fetch must refuse on the 3xx itself
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/hop.json", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getResponseHeaders.add("Location", "http://203.0.113.9/evil.json")
      ex.sendResponseHeaders(302, -1); ex.close()
    })
    server.createContext("/counted.json", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val bytes = """{"v":7}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val e = intercept[Exception](
        spark.sql(s"SELECT * FROM url('http://127.0.0.1:$port/hop.json')"))
      assert(e.getMessage.contains("redirect"))
      // parse the same URL twice (EXPLAIN parses without executing):
      // the fetch cache must make that one HTTP request, not two
      spark.sql(s"EXPLAIN SELECT v FROM url('http://127.0.0.1:$port/counted.json')").collect()
      assert(spark.sql(s"SELECT v FROM url('http://127.0.0.1:$port/counted.json')")
        .head().getLong(0) == 7L)
      assert(hits.get() == 1, s"expected one fetch, saw ${hits.get()}")
    } finally server.stop(0)

    // `FROM url(...)` inside a string literal is data — no rewrite, no
    // fetch (an attempted fetch of this host would throw the refusal)
    val lit = spark.sql("SELECT 'see FROM url(''https://example.com/x.csv'') for more' AS s")
      .head().getString(0)
    assert(lit.contains("FROM url('https://example.com/x.csv')"))

    // a bound parameter on an intercepted maintenance command cannot
    // reach the run-time predicate re-parse — refuse, don't mis-execute
    val ep = intercept[Exception](
      spark.sql("ALTER TABLE some_t DELETE WHERE id = ?", Array(1)))
    assert(ep.getMessage.contains("inline the values"))
  }

  test("ALTER TABLE ADD/DROP/RENAME/MODIFY COLUMN execute with CH default semantics") {
    spark.sql("DROP TABLE IF EXISTS ddl_col")
    val wh = new org.apache.hadoop.fs.Path(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    whFs.delete(new org.apache.hadoop.fs.Path(wh, "ddl_col"), true)
    spark.sql("""CREATE TABLE ddl_col (id UInt64, v Float64, p String)
                 ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    spark.range(4).selectExpr("id", "CAST(id AS DOUBLE) * 1.5 AS v",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p")
      .createOrReplaceTempView("ddl_col_src")
    spark.sql("INSERT INTO ddl_col SELECT id, v, p FROM ddl_col_src")

    // ADD without DEFAULT backfills the CH type default (0, not null)
    spark.sql("ALTER TABLE ddl_col ADD COLUMN cnt UInt32")
    val afterAdd = spark.sql("SELECT id, cnt FROM ddl_col ORDER BY id").collect()
    assert(afterAdd.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L))
    // ADD with DEFAULT expression referencing another column, AFTER pos
    spark.sql("ALTER TABLE ddl_col ADD COLUMN v2 Float64 DEFAULT v * 2 AFTER v")
    val cols = spark.table("ddl_col").schema.fieldNames.toSeq.filterNot(_ == "p")
    assert(cols == Seq("id", "v", "v2", "cnt"), cols.toString)
    assert(spark.sql("SELECT count(*) FROM ddl_col WHERE v2 = v * 2").head().getLong(0) == 4)
    // Nullable ADD → nulls; IF NOT EXISTS no-op
    spark.sql("ALTER TABLE ddl_col ADD COLUMN note Nullable(String)")
    assert(spark.sql("SELECT count(*) FROM ddl_col WHERE note IS NULL").head().getLong(0) == 4)
    spark.sql("ALTER TABLE ddl_col ADD COLUMN IF NOT EXISTS note Nullable(String)")
    // RENAME + MODIFY (widen type) + DROP
    spark.sql("ALTER TABLE ddl_col RENAME COLUMN cnt TO hits")
    spark.sql("ALTER TABLE ddl_col MODIFY COLUMN hits UInt64")
    assert(spark.table("ddl_col").schema("hits").dataType.simpleString == "bigint")
    spark.sql("ALTER TABLE ddl_col DROP COLUMN note")
    assert(!spark.table("ddl_col").schema.fieldNames.contains("note"))
    // rows survived all five rewrites, partitioned layout intact
    val r = spark.sql(
      "SELECT count(*) AS n, CAST(sum(hits) AS BIGINT) AS s FROM ddl_col").head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 0)
    assert(spark.sql("SELECT count(*) FROM ddl_col WHERE p = 'a'").head().getLong(0) == 2)
    // partition column refuses; unknown column fails loudly
    val e1 = intercept[Exception](spark.sql("ALTER TABLE ddl_col DROP COLUMN p"))
    assert(e1.getMessage.contains("partition key"))
    val e2 = intercept[Exception](spark.sql("ALTER TABLE ddl_col DROP COLUMN nope"))
    assert(e2.getMessage.contains("no column"))
    spark.sql("DROP TABLE IF EXISTS ddl_col")
  }

  test("CTAS with ENGINE clause and ALTER TABLE DROP PARTITION execute") {
    for (t <- Seq("ddl_ctas", "ddl_dp")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
    // ClickHouse CTAS spelling: schema from the SELECT, layout hints strip
    spark.sql("""CREATE TABLE ddl_ctas ENGINE = MergeTree ORDER BY id AS
                 SELECT id, id % 3 AS bucket FROM range(30)""")
    assert(spark.table("ddl_ctas").count() == 30)
    // partitioned CTAS + DROP PARTITION (string literal cast to the key type)
    spark.sql("""CREATE TABLE ddl_dp ENGINE = MergeTree PARTITION BY g ORDER BY id AS
                 SELECT id, CAST(id % 3 AS BIGINT) AS g FROM range(30)""")
    val r = spark.sql("ALTER TABLE ddl_dp DROP PARTITION '1'").head()
    assert(r.getLong(0) == 1L)
    val left = spark.sql("SELECT DISTINCT g FROM ddl_dp ORDER BY g").collect().map(_.getLong(0))
    assert(left.toSeq == Seq(0L, 2L))
    // missing partition fails loudly
    intercept[Exception](spark.sql("ALTER TABLE ddl_dp DROP PARTITION '9'"))
    // DETACH parks the partition (invisible to reads, data intact);
    // ATTACH brings it back untouched — one directory rename each way
    assert(spark.sql("ALTER TABLE ddl_dp DETACH PARTITION '0'").head().getLong(0) == 1L)
    assert(spark.sql("SELECT DISTINCT g FROM ddl_dp ORDER BY g").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(spark.sql("ALTER TABLE ddl_dp ATTACH PARTITION '0'").head().getLong(0) == 1L)
    assert(spark.sql("SELECT DISTINCT g FROM ddl_dp ORDER BY g").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 2L))
    // detaching a missing partition / attaching a non-detached one fail loudly
    intercept[Exception](spark.sql("ALTER TABLE ddl_dp DETACH PARTITION '9'"))
    intercept[Exception](spark.sql("ALTER TABLE ddl_dp ATTACH PARTITION '2'"))
    // cross-table attach still refuses toward copy + ATTACH
    val e = intercept[Exception](
      spark.sql("ALTER TABLE ddl_dp ATTACH PARTITION '0' FROM ddl_ctas"))
    assert(e.getMessage.contains("copy"))
    // FREEZE keeps refusing
    val e2 = intercept[Exception](spark.sql("ALTER TABLE ddl_dp FREEZE PARTITION '0'"))
    assert(e2.getMessage.contains("no single-engine analog"))
    for (t <- Seq("ddl_ctas", "ddl_dp")) spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("SELECT DISTINCT ON rewrites to LIMIT 1 BY semantics") {
    spark.range(12).selectExpr("id", "id % 3 AS k", "id % 4 AS v")
      .createOrReplaceTempView("don_t")
    // first row per k ordered by v desc, id — deterministic winner
    val r = spark.sql(
      "SELECT DISTINCT ON (k) k, id, v FROM don_t ORDER BY v DESC, id")
      .orderBy("k").collect()
    assert(r.length == 3)
    // per k the winner has the max v (ties by min id): k=0 → id 3 (v=3),
    // k=1 → id 7 (v=3), k=2 → id 11 (v=3)
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((0L, 3L), (1L, 7L), (2L, 11L)))
    val e = intercept[Exception](
      spark.sql("SELECT DISTINCT ON (k) k, v FROM don_t"))
    assert(e.getMessage.contains("DISTINCT ON"))
  }

  test("INTO OUTFILE executes as an export command") {
    val dir = s"/tmp/graft_outfile_${java.util.UUID.randomUUID().toString.take(8)}"
    val r = spark.sql(
      s"SELECT id, id * 2 AS dbl FROM range(5) INTO OUTFILE '$dir' FORMAT Parquet").head()
    assert(r.getLong(0) == 5L)
    assert(spark.read.parquet(dir).count() == 5)
    // header format + dialect functions inside the inner query
    val r2 = spark.sql(
      s"SELECT toString(id) AS s FROM range(3) INTO OUTFILE '$dir-csv' FORMAT CSVWithNames").head()
    assert(r2.getLong(0) == 3L)
    assert(spark.read.option("header", "true").csv(s"$dir-csv").count() == 3)
    // unsupported format refuses with the supported list (Arrow
    // joined the supported set in round 19 — Round19ArrowSpec)
    val bad = intercept[Exception](
      spark.sql(s"SELECT 1 INTO OUTFILE '$dir-x' FORMAT Avro"))
    assert(bad.getMessage.contains("supported here"))
    // re-running the export overwrites instead of failing
    assert(spark.sql(
      s"SELECT id FROM range(2) INTO OUTFILE '$dir' FORMAT Parquet").head().getLong(0) == 2L)
    assert(spark.read.parquet(dir).count() == 2)
    // the path is ONE regular file (the reference's contract: a
    // migrated script opens it directly), not a Spark part directory
    assert(new java.io.File(dir).isFile, s"$dir should be a single file")
    assert(new java.io.File(s"$dir-csv").isFile)
    // a parenthesized query prefix exports too
    val r3 = spark.sql(
      s"(SELECT id FROM range(4)) INTO OUTFILE '$dir-paren' FORMAT CSV").head()
    assert(r3.getLong(0) == 4L)
    assert(scala.io.Source.fromFile(s"$dir-paren").getLines().size == 4)
    // a non-SELECT prefix (CTAS) refuses loudly instead of silently
    // running without writing the file
    val ctas = intercept[Exception](spark.sql(
      s"CREATE TABLE outfile_ctas_t AS SELECT 1 AS x INTO OUTFILE '$dir-ctas'"))
    assert(ctas.getMessage.contains("top-level SELECT/WITH"))
    for (f <- Seq(dir, s"$dir-csv", s"$dir-paren"))
      new java.io.File(f).delete()
  }

  test("EXISTS TABLE and EXCHANGE TABLES") {
    for (t <- Seq("ddl_ex_a", "ddl_ex_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new org.apache.hadoop.fs.Path(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")))
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
    assert(spark.sql("EXISTS TABLE ddl_ex_a").head().getByte(0) == 0)
    // CH's CHECK TABLE raises UNKNOWN_TABLE for a missing table —
    // EXISTS is the probe that never fails
    intercept[Exception](spark.sql("CHECK TABLE ddl_ex_a").collect())
    spark.sql("CREATE TABLE ddl_ex_a ENGINE = MergeTree ORDER BY id AS SELECT id FROM range(3)")
    spark.sql("CREATE TABLE ddl_ex_b ENGINE = MergeTree ORDER BY id AS SELECT id FROM range(7)")
    assert(spark.sql("CHECK TABLE ddl_ex_a").head().getByte(0) == 1)
    assert(spark.sql("EXISTS ddl_ex_a").head().getByte(0) == 1)
    spark.sql("EXCHANGE TABLES ddl_ex_a AND ddl_ex_b")
    assert(spark.table("ddl_ex_a").count() == 7)
    assert(spark.table("ddl_ex_b").count() == 3)
    // EXPLAIN of an EXCHANGE must not execute it: it fails loudly at
    // the delegate (commands intercept only as full statements) and
    // the tables stay untouched — no parse-time side effects
    intercept[Exception](spark.sql("EXPLAIN EXCHANGE TABLES ddl_ex_a AND ddl_ex_b").collect())
    assert(spark.table("ddl_ex_a").count() == 7)
    val e = intercept[Exception](spark.sql("EXCHANGE TABLES ddl_ex_a AND nope_t"))
    assert(e.getMessage.contains("no table"))
    for (t <- Seq("ddl_ex_a", "ddl_ex_b")) spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("system.tables / system.columns / system.databases introspection") {
    spark.sql("DROP TABLE IF EXISTS sys_probe")
    try {
      spark.sql("""CREATE TABLE sys_probe (id UInt64, label String)
                   ENGINE = MergeTree ORDER BY id""")
      spark.range(3).createOrReplaceTempView("sys_probe_view")
      val t = spark.sql(
        "SELECT database, name, engine FROM system.tables WHERE name LIKE 'sys_probe%' ORDER BY name")
        .collect()
      assert(t.exists(r => r.getString(1) == "sys_probe" && r.getString(2) == "MergeTree"))
      assert(t.exists(r => r.getString(1) == "sys_probe_view" && r.getString(2) == "View"))
      val c = spark.sql(
        """SELECT name, type, position FROM system.columns
           WHERE table = 'sys_probe' ORDER BY position""").collect()
      assert(c.map(_.getString(0)).toSeq == Seq("id", "label"))
      assert(c.map(_.getString(1)).toSeq == Seq("Int64", "String"))
      assert(c.map(_.getInt(2)).toSeq == Seq(1, 2))
      val d = spark.sql("SELECT name FROM system.databases").collect().map(_.getString(0))
      assert(d.contains("default"))
      // round 17: key-membership flags from the engine manifest
      val cf = spark.sql(
        """SELECT name, is_in_partition_key, is_in_sorting_key FROM system.columns
           WHERE table = 'sys_probe' ORDER BY position""").collect()
      assert(cf.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ==
        Seq(("id", 0, 1), ("label", 0, 0)))
      // system.parts: one row per partition directory, bytes from file
      // metadata, rows from parquet FOOTERS (round 17) — never a scan
      spark.sql("INSERT INTO sys_probe VALUES (1, 'a'), (2, 'b')")
      val p = spark.sql(
        "SELECT partition, part_count, bytes_on_disk, rows FROM system.parts WHERE table = 'sys_probe'")
        .collect()
      assert(p.length == 1 && p(0).getString(0) == "all" &&
        p(0).getLong(1) >= 1L && p(0).getLong(2) > 0L && p(0).getLong(3) == 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS sys_probe")
      spark.catalog.dropTempView("sys_probe_view")
    }
  }

  test("ALTER/TTL on a freshly-created EMPTY table works (CREATE -> ALTER -> INSERT)") {
    spark.sql("DROP TABLE IF EXISTS ddl_empty")
    try {
      spark.sql("CREATE TABLE ddl_empty (id UInt64) ENGINE = MergeTree ORDER BY id")
      // no INSERT yet — schema DDL must not require data files
      spark.sql("ALTER TABLE ddl_empty ADD COLUMN v Float64")
      spark.sql("ALTER TABLE ddl_empty MODIFY TTL toDateTime(1) + INTERVAL 1 DAY")
      spark.sql("INSERT INTO ddl_empty VALUES (1, 2.5)")
      val r = spark.sql("SELECT id, v FROM ddl_empty").collect()
      assert(r.length == 1 && r(0).getLong(0) == 1L && r(0).getDouble(1) == 2.5)
      // self-exchange is a no-op, not a stranded __graft_exchange_tmp
      spark.sql("EXCHANGE TABLES ddl_empty AND ddl_empty")
      assert(spark.catalog.tableExists("ddl_empty"))
      assert(!spark.catalog.tableExists("__graft_exchange_tmp"))
    } finally spark.sql("DROP TABLE IF EXISTS ddl_empty")
  }

  test("system.functions lists the live registry with aggregate tags") {
    val n = spark.sql("SELECT count(*) AS n FROM system.functions").head().getLong(0)
    assert(n > 900, s"registry should be large, saw $n") // 939 at round 10
    val probe = spark.sql(
      """SELECT name, is_aggregate FROM system.functions
         WHERE name IN ('quantile', 'toStartOfMonth', 'uniqExact', 'cityHash64')
         ORDER BY name""").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(probe("quantile") == 1 && probe("uniqExact") == 1)
    assert(probe("toStartOfMonth") == 0 && probe("cityHash64") == 0)
    // every listed name actually resolves in the session
    val some = spark.sql(
      "SELECT name FROM system.functions WHERE is_aggregate = 0 ORDER BY name LIMIT 5")
      .collect().map(_.getString(0))
    assert(some.nonEmpty)
  }

  test("SYSTEM RELOAD DICTIONARY/DROP CACHE execute; system.dictionaries lists") {
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("sysd_src")
    spark.sql("""CREATE DICTIONARY sysd (k UInt64, v String) PRIMARY KEY k
                 SOURCE(CLICKHOUSE(TABLE 'sysd_src')) LAYOUT(FLAT())""")
    val rows = spark.sql(
      "SELECT name, key, hierarchical FROM system.dictionaries WHERE name = 'sysd'").collect()
    assert(rows.length == 1 && rows(0).getString(1) == "k" && rows(0).getInt(2) == 0)
    assert(spark.sql("SHOW DICTIONARIES").collect().map(_.getString(0)).contains("sysd"))
    spark.sql("SYSTEM RELOAD DICTIONARY sysd")
    spark.sql("SYSTEM RELOAD DICTIONARIES")
    spark.sql("SYSTEM DROP MARK CACHE")
    val e = intercept[Exception](spark.sql("SYSTEM RELOAD DICTIONARY no_such"))
    assert(e.getMessage.contains("does not exist"))
    val e2 = intercept[Exception](spark.sql("SYSTEM FLUSH LOGS"))
    assert(e2.getMessage.contains("no server"))
    spark.sql("DROP DICTIONARY sysd")
  }

  test("system.numbers LIMIT and system.one generators") {
    assert(spark.sql("SELECT sum(number) FROM system.numbers LIMIT 10").head().getLong(0) == 45L)
    assert(spark.sql("SELECT dummy FROM system.one").head().getInt(0) == 0)
  }

  test("EXPLAIN flavors and RENAME TABLE rewrite") {
    val ast = spark.sql("EXPLAIN SYNTAX SELECT 1").head().getString(0)
    assert(ast.contains("Parsed Logical Plan") || ast.contains("== Physical Plan =="))
    val pipe = spark.sql("EXPLAIN PIPELINE SELECT count(*) FROM system.one").head().getString(0)
    assert(pipe.contains("(1)") || pipe.contains("Physical Plan"))
    // CH's analyzer-era flavor maps to the logical-plan dump too
    val qt = spark.sql("EXPLAIN QUERY TREE SELECT 1").head().getString(0)
    assert(qt.contains("Parsed Logical Plan") || qt.contains("== Physical Plan =="))
    spark.sql("DROP TABLE IF EXISTS ren_a"); spark.sql("DROP TABLE IF EXISTS ren_b")
    spark.sql("CREATE TABLE ren_a (x UInt32) ENGINE = Memory")
    spark.sql("RENAME TABLE ren_a TO ren_b")
    assert(spark.catalog.tableExists("ren_b") && !spark.catalog.tableExists("ren_a"))
    spark.sql("DROP TABLE ren_b")
    // multi-pair executes sequentially (round 11), including the CH
    // swap-via-tmp chain where later sources are created mid-chain
    for (t <- Seq("ren_m1", "ren_m2", "ren_m3", "ren_m4", "ren_tmp")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"${spark.conf.get("spark.sql.warehouse.dir")}/$t"), true)
    }
    spark.sql("CREATE TABLE ren_m1 (x UInt32) ENGINE = Memory")
    spark.sql("INSERT INTO ren_m1 VALUES (1)")
    spark.sql("CREATE TABLE ren_m2 (x UInt32) ENGINE = Memory")
    spark.sql("INSERT INTO ren_m2 VALUES (2)")
    spark.sql("RENAME TABLE ren_m1 TO ren_tmp, ren_m2 TO ren_m1, ren_tmp TO ren_m2")
    assert(spark.table("ren_m1").head().getLong(0) == 2L) // swapped (UInt32 widens to BIGINT)
    assert(spark.table("ren_m2").head().getLong(0) == 1L)
    // a missing source anywhere aborts before any rename
    val e = intercept[Exception](spark.sql("RENAME TABLE ren_m1 TO ren_m3, nope TO ren_m4"))
    assert(e.getMessage.contains("does not exist"))
    assert(spark.catalog.tableExists("ren_m1") && !spark.catalog.tableExists("ren_m3"))
    for (t <- Seq("ren_m1", "ren_m2")) spark.sql(s"DROP TABLE $t")
  }

  test("DDL type mapper survives randomly nested container types") {
    val rnd = new scala.util.Random(20260813L)
    val scalars = Seq(
      "UInt64" -> "BIGINT", "Int32" -> "INT", "Float64" -> "DOUBLE",
      "String" -> "STRING", "Date" -> "DATE", "DateTime" -> "TIMESTAMP",
      "Bool" -> "BOOLEAN", "Decimal(10, 2)" -> "DECIMAL(10,2)", "UUID" -> "STRING")
    def gen(depth: Int): (String, String) =
      if (depth == 0 || rnd.nextInt(3) == 0) scalars(rnd.nextInt(scalars.length))
      else rnd.nextInt(4) match {
        case 0 => val (c, s) = gen(depth - 1); (s"Array($c)", s"ARRAY<$s>")
        case 1 => val (c, s) = gen(depth - 1); (s"Nullable($c)", s)
        case 2 =>
          val (k, ks) = scalars(rnd.nextInt(scalars.length))
          val (v, vs) = gen(depth - 1)
          (s"Map($k, $v)", s"MAP<$ks, $vs>")
        case 3 =>
          val (a, as_) = gen(depth - 1); val (b, bs) = gen(depth - 1)
          (s"Tuple(f1 $a, f2 $b)", s"STRUCT<f1: $as_, f2: $bs>")
      }
    (1 to 15).foreach { i =>
      val cols = (1 to 3).map { j => val (ch, sp) = gen(2); (s"c$j", ch, sp) }
      spark.sql(s"DROP TABLE IF EXISTS ddl_fuzz_$i")
      spark.sql(s"CREATE TABLE ddl_fuzz_$i (${cols.map(c => s"${c._1} ${c._2}").mkString(", ")}) " +
        "ENGINE = MergeTree ORDER BY c1")
      val schema = spark.table(s"ddl_fuzz_$i").schema
      cols.foreach { case (n, ch, sp) =>
        assert(schema(n).dataType.sql == sp, s"$ch -> ${schema(n).dataType.sql}, want $sp")
      }
      spark.sql(s"DROP TABLE ddl_fuzz_$i")
    }
  }

  test("projection/TTL/dictionary/SYSTEM DDL refuse with operator pointers; TRUNCATE works") {
    def refusal(sql: String, hint: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(hint), s"$sql -> ${e.getMessage.take(100)}")
    }
    // sort-order projections EXECUTE since round 11, column subsets
    // since round 14 — what still refuses is an ORDER BY key missing
    // from the stored subset (needs a real table: shape validation
    // happens in the command)
    spark.sql("DROP TABLE IF EXISTS ddl_ref_t")
    spark.sql("CREATE TABLE ddl_ref_t (x UInt64, y UInt64) ENGINE = MergeTree ORDER BY x")
    refusal("ALTER TABLE ddl_ref_t ADD PROJECTION p (SELECT x ORDER BY y)", "SELECT list")
    spark.sql("DROP TABLE ddl_ref_t")
    refusal("ALTER TABLE t MODIFY TTL d + INTERVAL 30 DAY TO DISK 'cold'", "TO DISK")
    refusal("SYSTEM RESTART REPLICA r", "no server")
    // TRUNCATE on a DDL-created table is native Spark behavior
    spark.sql("DROP TABLE IF EXISTS ddl_trunc")
    spark.sql("CREATE TABLE ddl_trunc (k UInt32) ENGINE = Memory")
    spark.sql("INSERT INTO ddl_trunc VALUES (1), (2)")
    spark.sql("TRUNCATE TABLE ddl_trunc")
    assert(spark.sql("SELECT count(*) FROM ddl_trunc").head().getLong(0) == 0L)
    spark.sql("DROP TABLE ddl_trunc")
  }

  test("INSERT INTO FUNCTION file() writes through a directory insert") {
    val dir = s"/tmp/graft_ins_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.sql(s"INSERT INTO FUNCTION file('$dir', 'Parquet') SELECT id, id * 3 AS t FROM range(4)")
    assert(spark.sql(s"SELECT sum(t) FROM file('$dir', 'Parquet')").head().getLong(0) == 18L)
    // bare (no FUNCTION keyword) spelling too
    spark.sql(s"INSERT INTO file('$dir', 'Parquet') SELECT id, id AS t FROM range(2)")
    assert(spark.sql(s"SELECT count(*) FROM file('$dir', 'Parquet')").head().getLong(0) == 2L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("generateRandom produces the declared shape; unbounded refuses") {
    val r = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT s) > 1 AS varied
         FROM generateRandom('id UInt64, s String, d Date, ok Bool') LIMIT 50""").head()
    assert(r.getLong(0) == 50L && r.getBoolean(1))
    val schema = spark.sql(
      "SELECT * FROM generateRandom('a Int32, b Float64') LIMIT 1").schema
    assert(schema("a").dataType.sql == "INT" && schema("b").dataType.sql == "DOUBLE")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM generateRandom('a UInt64')"))
    assert(e.getMessage.contains("LIMIT"))
  }

  test("null() structure tables and remote() refusal") {
    val df = spark.sql("SELECT * FROM null('a UInt64, s String')")
    assert(df.count() == 0L)
    assert(df.schema("a").dataType.sql == "BIGINT" && df.schema("s").dataType.sql == "STRING")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM remote('host:9000', 'db.t')"))
    assert(e.getMessage.contains("egress"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM merge('otherdb', '^events')"))
    assert(e2.getMessage.contains("catalog"))
  }

  test("merge() unions name-matched catalog tables; _table only when referenced") {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("mrg_t1")
    Seq((3L, "c")).toDF("id", "v").createOrReplaceTempView("mrg_t2")
    // no _table reference -> plain union, SELECT * keeps the base schema
    val plain = spark.sql("SELECT * FROM merge('^mrg_t[0-9]$') ORDER BY id")
    assert(plain.columns.toSeq == Seq("id", "v"))
    assert(plain.count() == 3L)
    // _table referenced -> virtual column materializes per branch
    val tagged = spark.sql(
      "SELECT _table, count() AS c FROM merge('default', '^mrg_t') GROUP BY _table ORDER BY _table")
    assert(tagged.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("mrg_t1", 2L), ("mrg_t2", 1L)))
    // no match -> clear error
    val none = intercept[Exception](spark.sql("SELECT * FROM merge('^no_such_prefix')"))
    assert(none.getMessage.contains("no catalog table"))
    // drifted schemas refuse instead of positional mis-binding
    Seq((1L, 2L)).toDF("id", "other").createOrReplaceTempView("mrg_t3")
    val drift = intercept[Exception](spark.sql("SELECT * FROM merge('^mrg_t')"))
    assert(drift.getMessage.contains("differ"))
    // merge() inside a string literal is data, not syntax
    val lit = spark.sql("SELECT 'FROM merge(''^mrg_t'')' AS s").collect()(0).getString(0)
    assert(lit.contains("merge"))
    // '_table' inside a string LITERAL must not change the schema
    val litTable = spark.sql(
      "SELECT * FROM merge('^mrg_t[12]$') WHERE v <> 'see _table docs' ORDER BY id")
    assert(litTable.columns.toSeq == Seq("id", "v"))
  }

  test("CREATE DICTIONARY executes: dictGet resolves, hierarchy flag works, DROP removes") {
    import spark.implicits._
    Seq((1L, "one", 1L), (2L, "two", 1L), (3L, "three", 1L)) // root = self-parent
      .toDF("k", "label", "parent").createOrReplaceTempView("dict_src_t")
    spark.sql("""CREATE DICTIONARY ddl_dict (k UInt64, label String, parent UInt64 HIERARCHICAL)
                 PRIMARY KEY k
                 SOURCE(CLICKHOUSE(TABLE 'dict_src_t'))
                 LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 300)""")
    val got = spark.sql(
      "SELECT dictGet('ddl_dict', 'label', CAST(id + 1 AS BIGINT)) AS l FROM range(2) ORDER BY l")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("one", "two"))
    // HIERARCHICAL parent attribute wires dictGetHierarchy
    val chain = spark.sql("SELECT dictGetHierarchy('ddl_dict', CAST(3 AS BIGINT)) AS c")
      .head().getSeq[Long](0)
    assert(chain == Seq(3L, 1L))
    // IF NOT EXISTS is a no-op on an existing name
    spark.sql("""CREATE DICTIONARY IF NOT EXISTS ddl_dict (k UInt64, label String)
                 PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'no_such_table')) LAYOUT(FLAT())""")
    // missing source table fails at DDL time, not first dictGet
    val e = intercept[Exception](
      spark.sql("""CREATE DICTIONARY ddl_dict2 (k UInt64, label String) PRIMARY KEY k
                   SOURCE(CLICKHOUSE(TABLE 'no_such_table')) LAYOUT(HASHED())"""))
    assert(e.getMessage.toLowerCase.contains("no_such_table") ||
      e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    spark.sql("DROP DICTIONARY ddl_dict")
    assert(!graft.operators.Dictionaries.exists("ddl_dict"))
    spark.sql("DROP DICTIONARY IF EXISTS ddl_dict") // no-op, no throw
    val e3 = intercept[Exception](spark.sql("DROP DICTIONARY ddl_dict"))
    assert(e3.getMessage.contains("does not exist"))
  }

  test("COMPLEX_KEY dictionary: composite-key DDL + tuple() lookups; guards refuse") {
    import spark.implicits._
    Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "x", 30.0))
      .toDF("a", "b", "v").createOrReplaceTempView("ck_dict_src")
    spark.sql("DROP DICTIONARY IF EXISTS ck_dict")
    spark.sql("""CREATE DICTIONARY ck_dict (a UInt64, b String, v Float64)
                 PRIMARY KEY a, b
                 SOURCE(CLICKHOUSE(TABLE 'ck_dict_src'))
                 LAYOUT(COMPLEX_KEY_HASHED())""")
    val got = spark.sql(
      """SELECT dictGet('ck_dict', 'v', tuple(CAST(1 AS BIGINT), 'y')) AS v1,
                dictGetOrDefault('ck_dict', 'v', tuple(CAST(9 AS BIGINT), 'z'), -1.0) AS v2,
                dictHas('ck_dict', tuple(CAST(2 AS BIGINT), 'x')) AS h1,
                dictHas('ck_dict', tuple(CAST(2 AS BIGINT), 'y')) AS h2""").head()
    assert(got.getDouble(0) == 20.0)
    assert(got.getDouble(1) == -1.0)
    assert(got.getBoolean(2) && !got.getBoolean(3))
    // a non-tuple (wrong-arity) key refuses with the tuple contract
    val e = intercept[Exception](spark.sql(
      "SELECT dictGet('ck_dict', 'v', CAST(1 AS BIGINT))").collect())
    assert(e.getMessage.contains("tuple"), s"got: ${e.getMessage}")
    // >1 key column without a COMPLEX_KEY layout refuses (CH's own rule)
    val e2 = intercept[Exception](spark.sql(
      """CREATE DICTIONARY ck_bad (a UInt64, b String, v Float64)
         PRIMARY KEY a, b SOURCE(CLICKHOUSE(TABLE 'ck_dict_src')) LAYOUT(HASHED())"""))
    assert(e2.getMessage.contains("COMPLEX_KEY"))
    // hierarchical + composite refuses (CH requires a single UInt64 key)
    val e3 = intercept[Exception](spark.sql(
      """CREATE DICTIONARY ck_bad2 (a UInt64, b String HIERARCHICAL, v Float64)
         PRIMARY KEY a, b SOURCE(CLICKHOUSE(TABLE 'ck_dict_src'))
         LAYOUT(COMPLEX_KEY_HASHED())"""))
    assert(e3.getMessage.contains("single"))
    spark.sql("DROP DICTIONARY ck_dict")
  }

  test("ON CLUSTER strips on DDL; a join predicate on a `cluster` column survives") {
    spark.sql("DROP TABLE IF EXISTS oc_t")
    // the replicated-DDL spelling a migrated estate issues verbatim —
    // on a single engine the statement IS cluster-wide
    spark.sql("CREATE TABLE oc_t ON CLUSTER main (a UInt64) ENGINE = MergeTree ORDER BY a")
    spark.sql("INSERT INTO oc_t VALUES (1)")
    assert(spark.table("oc_t").count() == 1L)
    spark.sql("TRUNCATE TABLE IF EXISTS oc_t ON CLUSTER main")
    assert(spark.table("oc_t").count() == 0L)
    spark.sql("DROP TABLE IF EXISTS oc_t ON CLUSTER 'quoted-name'")
    assert(!spark.catalog.tableExists("oc_t"))
    // a CTAS whose BODY joins on a column literally named `cluster`
    // must keep that predicate (the strip only looks before SELECT)
    spark.sql("DROP TABLE IF EXISTS oc_ctas")
    spark.range(3).selectExpr("id", "CAST(id % 2 AS BIGINT) AS cluster")
      .createOrReplaceTempView("oc_src")
    spark.sql("""CREATE TABLE oc_ctas ENGINE = MergeTree ORDER BY id AS
                 SELECT a.id FROM oc_src a
                 JOIN (SELECT id AS id2, CAST(id % 2 AS BIGINT) AS flag FROM range(3)) b
                   ON cluster = b.flag AND a.id = b.id2""")
    assert(spark.table("oc_ctas").count() == 3L)
    spark.sql("DROP TABLE oc_ctas")
  }

  test("MODIFY/MATERIALIZE/REMOVE TTL execute: expired rows drop on materialize") {
    spark.sql("DROP TABLE IF EXISTS ttl_ddl_t")
    spark.sql("""CREATE TABLE ttl_ddl_t (id UInt64, d DateTime)
                 ENGINE = MergeTree ORDER BY id""")
    spark.sql("""INSERT INTO ttl_ddl_t VALUES
                 (1, toDateTime('2020-01-01 00:00:00')),
                 (2, toDateTime('2123-01-01 00:00:00')),
                 (3, toDateTime('2019-06-01 00:00:00'))""")
    // MODIFY alone is metadata: nothing deleted yet
    spark.sql("ALTER TABLE ttl_ddl_t MODIFY TTL d + INTERVAL 30 DAY")
    assert(spark.table("ttl_ddl_t").count() == 3L)
    // MATERIALIZE applies: 2020/2019 rows are long past d+30d
    spark.sql("ALTER TABLE ttl_ddl_t MATERIALIZE TTL")
    assert(spark.table("ttl_ddl_t").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // REMOVE clears the rule; MATERIALIZE then refuses
    spark.sql("ALTER TABLE ttl_ddl_t REMOVE TTL")
    val e = intercept[Exception](spark.sql("ALTER TABLE ttl_ddl_t MATERIALIZE TTL"))
    assert(e.getMessage.contains("no TTL"))
    // a TTL over a missing column fails at MODIFY time
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE ttl_ddl_t MODIFY TTL nope + INTERVAL 1 DAY"))
    assert(e2.getMessage.toLowerCase.contains("nope") ||
      e2.getMessage.contains("UNRESOLVED_COLUMN"))
    spark.sql("DROP TABLE ttl_ddl_t")
  }

  test("TTL DELETE WHERE scopes expiry; TTL GROUP BY SET rolls expired rows up") {
    for (t <- Seq("ttl_w_t", "ttl_g_t")) { // clear stale locations too
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      for (sfx <- Seq("", "__graft_backup", "__graft_mutating"))
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${spark.conf.get("spark.sql.warehouse.dir")}/$t$sfx"), true)
    }
    spark.sql("""CREATE TABLE ttl_w_t (id UInt64, kind String, v Float64, d DateTime)
                 ENGINE = MergeTree ORDER BY id""")
    spark.sql("""INSERT INTO ttl_w_t VALUES
                 (1, 'tmp',  1.0, toDateTime('2020-01-01 00:00:00')),
                 (2, 'keep', 2.0, toDateTime('2020-01-01 00:00:00')),
                 (3, 'tmp',  3.0, toDateTime('2123-01-01 00:00:00'))""")
    // WHERE scope: only expired 'tmp' rows go; the expired 'keep' row stays
    spark.sql("ALTER TABLE ttl_w_t MODIFY TTL d + INTERVAL 30 DAY DELETE WHERE kind = 'tmp'")
    spark.sql("ALTER TABLE ttl_w_t MATERIALIZE TTL")
    assert(spark.table("ttl_w_t").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    spark.sql("DROP TABLE ttl_w_t")

    spark.sql("DROP TABLE IF EXISTS ttl_g_t")
    spark.sql("""CREATE TABLE ttl_g_t (k String, id UInt64, v Float64, d DateTime)
                 ENGINE = MergeTree ORDER BY (k, id)""")
    spark.sql("""INSERT INTO ttl_g_t VALUES
                 ('a', 1, 10.0, toDateTime('2020-01-01 00:00:00')),
                 ('a', 2, 20.0, toDateTime('2020-02-01 00:00:00')),
                 ('b', 3, 30.0, toDateTime('2020-01-01 00:00:00')),
                 ('a', 4, 40.0, toDateTime('2123-01-01 00:00:00'))""")
    // expired rows collapse per k: SET column aggregated, other
    // columns take min (the deterministic stand-in for CH's any)
    spark.sql("ALTER TABLE ttl_g_t MODIFY TTL d + INTERVAL 30 DAY GROUP BY k SET v = sum(v)")
    val rep = spark.sql("ALTER TABLE ttl_g_t MATERIALIZE TTL").head()
    assert(rep.getLong(2) == 3L) // three expired rows
    val got = spark.table("ttl_g_t").orderBy("k", "id")
      .select("k", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 1L, 30.0), ("a", 4L, 40.0), ("b", 3L, 30.0)), s"got $got")
    // the rolled-up 'a'/'b' rows carry min(d)=2020 → still expired →
    // a second materialize re-collapses them to themselves:
    // idempotent content (2 rows touched, nothing changes)
    assert(spark.sql("ALTER TABLE ttl_g_t MATERIALIZE TTL").head().getLong(2) == 2L)
    val again = spark.table("ttl_g_t").orderBy("k", "id")
      .select("k", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again == got, s"second materialize changed content: $again")
    // SET on a grouping key refuses
    val e = intercept[Exception](
      spark.sql("ALTER TABLE ttl_g_t MODIFY TTL d GROUP BY k SET k = min(k)"))
    assert(e.getMessage.contains("grouping key"))
    // storage tiering still refuses with the supported list
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE ttl_g_t MODIFY TTL d + INTERVAL 1 DAY TO DISK 'cold'"))
    assert(e2.getMessage.contains("tiering"))
    spark.sql("DROP TABLE ttl_g_t")
  }

  test("ADD PROJECTION executes; matching aggregates auto-use it; staleness falls back") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString // FileScan shows the location
    drop("proj_ddl_t")
    spark.sql("""CREATE TABLE proj_ddl_t (k String, v Float64)
                 ENGINE = MergeTree ORDER BY k""")
    spark.sql("INSERT INTO proj_ddl_t VALUES ('a', 1.0), ('a', 2.0), ('b', 10.0)")
    spark.sql("""ALTER TABLE proj_ddl_t ADD PROJECTION p_agg
                 (SELECT k, count(), sum(v), max(v) GROUP BY k)""")
    val q = "SELECT k, count(*) AS c, sum(v) AS s FROM proj_ddl_t GROUP BY k ORDER BY k"
    val df1 = spark.sql(q)
    assert(planOf(df1).contains("_graft_proj_p_agg"), "aggregate should scan the projection")
    assert(df1.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 3.0), ("b", 1L, 10.0)))
    // group-key filter rides along
    val df1f = spark.sql("SELECT k, max(v) AS m FROM proj_ddl_t WHERE k = 'b' GROUP BY k")
    assert(planOf(df1f).contains("_graft_proj_p_agg"))
    assert(df1f.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("b", 10.0)))
    // a non-covered aggregate (avg) must NOT use the projection
    assert(!planOf(spark.sql("SELECT k, avg(v) AS a FROM proj_ddl_t GROUP BY k"))
      .contains("_graft_proj_p_agg"))
    // INSERT invalidates the fingerprint: fall back to base, results fresh
    spark.sql("INSERT INTO proj_ddl_t VALUES ('b', 5.0)")
    val df2 = spark.sql(q)
    assert(!planOf(df2).contains("_graft_proj_p_agg"), "stale projection must not be read")
    assert(df2.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 3.0), ("b", 2L, 15.0)))
    // MATERIALIZE re-pins: used again with the new data
    spark.sql("ALTER TABLE proj_ddl_t MATERIALIZE PROJECTION p_agg")
    val df3 = spark.sql(q)
    assert(planOf(df3).contains("_graft_proj_p_agg"))
    assert(df3.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 3.0), ("b", 2L, 15.0)))
    // CLEAR drops the data but keeps the declaration → fallback
    spark.sql("ALTER TABLE proj_ddl_t CLEAR PROJECTION p_agg")
    assert(!planOf(spark.sql(q)).contains("_graft_proj_p_agg"))
    spark.sql("ALTER TABLE proj_ddl_t MATERIALIZE PROJECTION p_agg")
    assert(planOf(spark.sql(q)).contains("_graft_proj_p_agg"))
    // DROP removes declaration + data
    spark.sql("ALTER TABLE proj_ddl_t DROP PROJECTION p_agg")
    assert(!planOf(spark.sql(q)).contains("_graft_proj_p_agg"))
    spark.sql("ALTER TABLE proj_ddl_t DROP PROJECTION IF EXISTS p_agg") // no-op
    // column-subset sort form (round 14) executes
    spark.sql("ALTER TABLE proj_ddl_t ADD PROJECTION s (SELECT k, v ORDER BY v)")
    assert(planOf(spark.sql("SELECT k FROM proj_ddl_t WHERE v = 5.0"))
      .contains("_graft_proj_s"))
    spark.sql("DROP TABLE proj_ddl_t")
  }

  test("column-subset sort projection: engages iff the query's columns fit the subset") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    drop("subproj_t")
    spark.sql("""CREATE TABLE subproj_t (id UInt64, v UInt64, s String, wide String)
                 ENGINE = MergeTree ORDER BY id""")
    spark.sql("""INSERT INTO subproj_t
                 SELECT id, (id * 37) % 1000 AS v, concat('row', id) AS s,
                        repeat('x', 100) AS wide
                 FROM range(5000)""")
    spark.sql("ALTER TABLE subproj_t ADD PROJECTION by_v (SELECT id, v, s ORDER BY v)")
    // the stored layout holds ONLY the subset columns
    val stored = spark.read.parquet(
      spark.sql("DESCRIBE TABLE EXTENDED subproj_t").collect()
        .find(_.getString(0) == "Location").map(_.getString(1)).get + "__graft_proj_by_v")
    assert(stored.schema.fieldNames.toSet == Set("id", "v", "s"))
    // covered query: engages, same rows as base
    val q = "SELECT id, s FROM subproj_t WHERE v = 37 ORDER BY id"
    val df1 = spark.sql(q)
    assert(planOf(df1).contains("_graft_proj_by_v"), s"expected subset scan:\n${planOf(df1)}")
    val ids = df1.collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty && ids == ids.sorted)
    spark.conf.set("spark.graft.projections.autoUse", "false")
    val baseIds = try spark.sql(q).collect().map(_.getLong(0)).toSeq
    finally spark.conf.set("spark.graft.projections.autoUse", "true")
    assert(ids == baseIds)
    // a query touching a column OUTSIDE the subset stays on base
    assert(!planOf(spark.sql("SELECT id, wide FROM subproj_t WHERE v = 37"))
      .contains("_graft_proj_by_v"))
    // staleness discipline carries over: INSERT → base, MATERIALIZE → back
    spark.sql("INSERT INTO subproj_t VALUES (99999, 37, 'late', 'w')")
    assert(!planOf(spark.sql(q)).contains("_graft_proj_by_v"))
    spark.sql("ALTER TABLE subproj_t MATERIALIZE PROJECTION by_v")
    val df3 = spark.sql(q)
    assert(planOf(df3).contains("_graft_proj_by_v"))
    assert(df3.collect().map(_.getLong(0)).toSeq.contains(99999L))
    spark.sql("DROP TABLE subproj_t")
  }

  test("sort-order projection DDL: leading-key filters auto-use the sorted layout") {
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    drop("sortproj_t")
    spark.sql("""CREATE TABLE sortproj_t (id UInt64, v UInt64, s String)
                 ENGINE = MergeTree ORDER BY id""")
    spark.sql("""INSERT INTO sortproj_t
                 SELECT id, (id * 37) % 1000 AS v, concat('row', id) AS s
                 FROM range(5000)""")
    spark.sql("ALTER TABLE sortproj_t ADD PROJECTION by_v (SELECT * ORDER BY v)")
    // a selective leading-key predicate scans the sorted sibling
    val q = "SELECT id, v, s FROM sortproj_t WHERE v = 37 ORDER BY id"
    val df1 = spark.sql(q)
    assert(planOf(df1).contains("_graft_proj_by_v"), s"expected projection scan:\n${planOf(df1)}")
    val rows = df1.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == 37L))
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
    // same rows as the base scan answers (v < 1000 always, so
    // v % 1000 = 37 is equivalent but not a stats-prunable shape → base)
    val base = spark.sql(
      "SELECT id FROM sortproj_t WHERE v % 1000 = 37 ORDER BY id")
    assert(!planOf(base).contains("_graft_proj_by_v"))
    assert(rows.map(_.getLong(0)).toSeq == base.collect().map(_.getLong(0)).toSeq)
    // range predicates prune too
    assert(planOf(spark.sql("SELECT count(*) AS c FROM sortproj_t WHERE v < 10"))
      .contains("_graft_proj_by_v"))
    // a filter NOT on the leading key stays on base
    assert(!planOf(spark.sql("SELECT count(*) AS c FROM sortproj_t WHERE s = 'row7'"))
      .contains("_graft_proj_by_v"))
    // staleness: INSERT falls back, MATERIALIZE re-engages
    spark.sql("INSERT INTO sortproj_t VALUES (99999, 37, 'late')")
    val df2 = spark.sql(q)
    assert(!planOf(df2).contains("_graft_proj_by_v"), "stale sort projection must not be read")
    assert(df2.collect().map(_.getLong(0)).toSeq.contains(99999L))
    spark.sql("ALTER TABLE sortproj_t MATERIALIZE PROJECTION by_v")
    val df3 = spark.sql(q)
    assert(planOf(df3).contains("_graft_proj_by_v"))
    assert(df3.collect().map(_.getLong(0)).toSeq.contains(99999L))
    spark.sql("DROP TABLE sortproj_t")
  }

  test("CREATE DICTIONARY from a FILE source") {
    val dir = s"/tmp/graft_dictfile_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.range(5).selectExpr("id AS k", "concat('v', id) AS v")
      .write.mode("overwrite").parquet(dir)
    spark.sql(s"""CREATE DICTIONARY ddl_fdict (k UInt64, v String) PRIMARY KEY k
                  SOURCE(FILE(PATH '$dir' FORMAT 'Parquet')) LAYOUT(FLAT())""")
    assert(spark.sql("SELECT dictGet('ddl_fdict', 'v', CAST(4 AS BIGINT)) AS v")
      .head().getString(0) == "v4")
    spark.sql("DROP DICTIONARY ddl_fdict")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cluster()/clusterAllReplicas() read the table directly") {
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x").createOrReplaceTempView("clu_t")
    val a = spark.sql("SELECT sum(k) AS s FROM cluster('default', clu_t)").collect()(0).getLong(0)
    val b = spark.sql(
      "SELECT sum(k) AS s FROM clusterAllReplicas('default', default.clu_t)").collect()(0).getLong(0)
    assert(a == 3L && b == 3L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM cluster('default', otherdb.t)"))
    assert(e.getMessage.contains("catalog"))
  }
}
