package graft

import graft.operators.MatView
import graft.streaming.StreamingMatView
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous materialized-view maintenance: the streamed store must
  * equal the batch recompute over everything ingested, and a replayed
  * micro-batch (at-least-once delivery) must fold away through the
  * refreshOnce idempotence marker. */
class StreamingMatViewSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MatView.spec(Seq("k"),
    MatView.countState("cnt"),
    MatView.sumState("s", col("v")),
    MatView.maxState("hi", col("v")))

  private def storePath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_smv_$tag")
    d.toFile.deleteOnExit()
    d.resolve("store").toString
  }

  private def readMap(path: String): Map[String, (Long, Double, Double)] =
    MatView.read(spark, spec, path).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  test("streamed store equals the batch recompute across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val path = storePath("eq")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smv_ckpt").toString
    val input = MemoryStream[(String, Double)]
    val q = StreamingMatView.attach(input.toDF().toDF("k", "v"), spec, path)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 5.0))
      q.processAllAvailable()
      input.addData(("a", 7.0), ("c", 2.0))
      q.processAllAvailable()
    } finally q.stop()

    val expected = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("a", 7.0), ("c", 2.0))
      .toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"), max("v").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(readMap(path) == expected)
  }

  test("a replayed batch id is skipped; a partial write (no marker) is retried") {
    val path = storePath("replay")
    val delta = Seq(("a", 10.0), ("b", 1.0)).toDF("k", "v")
    assert(MatView.refreshOnce(delta, spec, path, batchId = 0L))
    val once = readMap(path)
    // at-least-once redelivery of the same batch id: no double count
    assert(!MatView.refreshOnce(delta, spec, path, batchId = 0L))
    assert(readMap(path) == once)
    // a crashed half-write leaves no _SUCCESS: the retry must apply
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/batch=1/_SUCCESS"), false)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/batch=1"))
    assert(MatView.refreshOnce(delta, spec, path, batchId = 1L))
    assert(readMap(path)("a") == ((2L, 20.0, 10.0)))
  }

  test("Kafka-engine DDL drives the queue -> MV -> TO-table chain end-to-end") {
    import graft.streaming.KafkaEngine
    val topicDir = java.nio.file.Files.createTempDirectory("graft_kq_topic").toString
    val target   = java.nio.file.Files.createTempDirectory("graft_kq_tgt").resolve("t").toString
    val ckpt     = java.nio.file.Files.createTempDirectory("graft_kq_ckpt").toString

    def produce(name: String, lines: String*): Unit = {
      val tmp = java.nio.file.Paths.get(topicDir, s".$name.tmp")
      java.nio.file.Files.writeString(tmp, lines.mkString("\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(topicDir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // verbatim CH spellings: positional-args Kafka engine + MV TO
    val query = KafkaEngine.fromDdl(spark,
      """CREATE TABLE kq_events (k String, v Float64)
         ENGINE = Kafka('""" + topicDir + """', 'events', 'g1', 'JSONEachRow')""",
      """CREATE MATERIALIZED VIEW kq_mv TO kq_target AS
         SELECT k, count(*) AS cnt, sum(v) AS s FROM kq_events GROUP BY k""",
      target, ckpt)
    try {
      produce("b0.json", """{"k":"a","v":1.0}""", """{"k":"a","v":3.0}""", """{"k":"b","v":5.0}""")
      query.processAllAvailable()
      produce("b1.json", """{"k":"a","v":7.0}""", """{"k":"c","v":2.0}""")
      query.processAllAvailable()
    } finally query.stop()

    // merge-on-read over the appended partials (AggregatingMergeTree read)
    val merged = spark.read.parquet(target).groupBy("k")
      .agg(sum("cnt").as("cnt"), sum("s").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged == Map("a" -> (3L, 11.0), "b" -> (1L, 5.0), "c" -> (1L, 2.0)))

    // SETTINGS spelling parses to the same queue shape
    val qs = KafkaEngine.parseQueue(
      """CREATE TABLE kq2 (k String) ENGINE = Kafka
         SETTINGS kafka_broker_list = 'h:9092', kafka_topic_list = 'tp',
                  kafka_group_name = 'g2', kafka_format = 'JSONEachRow'""")
    assert(qs.brokers == "h:9092" && qs.topic == "tp" && qs.group == "g2")

    // the batch DDL front-end refuses to mistake a queue for a table
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE kq3 (k String) ENGINE = Kafka('h:9092', 't', 'g', 'JSONEachRow')"))
    assert(e.getMessage.contains("KafkaEngine"))
  }

  test("broker spelling routes to the stock kafka connector (descope boundary pinned)") {
    import graft.streaming.KafkaEngine
    // DESCOPE, the q35b way: no Kafka broker can run in this sandbox
    // (no spark-sql-kafka/kafka-clients jars on the unmanaged
    // classpath, offline resolver, zero egress — an embedded KRaft
    // broker needs both), so the cluster transport can't be driven
    // end-to-end HERE. What this pins instead: a non-file broker
    // spelling must construct the STOCK `kafka` connector source
    // (subscribe = topic, earliest offsets) — the exact seam a real
    // cluster completes by shipping org.apache.spark:spark-sql-kafka-
    // 0-10 — so the refusal is the connector's own missing-jar error,
    // never a silent fallback to some other transport.
    val q = KafkaEngine.parseQueue(
      """CREATE TABLE kqb (k String, v Float64) ENGINE = Kafka
         SETTINGS kafka_broker_list = 'broker1:9092,broker2:9092',
                  kafka_topic_list = 'events', kafka_group_name = 'g',
                  kafka_format = 'JSONEachRow'""")
    val e = intercept[Exception](KafkaEngine.source(spark, q))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.toLowerCase.contains("kafka")),
      s"expected the stock connector's missing-source error, got: ${msgs(e).headOption}")
    // non-JSON formats refuse with routing guidance on the connector path
    val e2 = intercept[IllegalArgumentException](
      KafkaEngine.source(spark, q.copy(format = "CSV")))
    assert(e2.getMessage.contains("landing directory"))
  }

  test("idempotence holds even with the committer's _SUCCESS markers off") {
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val path = storePath("nosuccess")
      val delta = Seq(("a", 4.0)).toDF("k", "v")
      assert(MatView.refreshOnce(delta, spec, path, batchId = 0L))
      // the write produced no _SUCCESS, but refreshOnce's own marker
      // still detects the replay
      assert(!MatView.refreshOnce(delta, spec, path, batchId = 0L))
      assert(readMap(path)("a") == ((1L, 4.0, 4.0)))
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
