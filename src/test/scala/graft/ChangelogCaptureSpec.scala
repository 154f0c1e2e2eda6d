package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.streaming.{CdcApply, Change, ChangelogSource, Materialized}
import org.apache.spark.sql.streaming.OutputMode

/** Capture → apply, end to end, file-driven: an external "capture
  * agent" (simulated with plain file appends, the Debezium-file
  * shape) drops JSONEachRow changelog files into a directory; the
  * engine tails it with ChangelogSource and folds it with CdcApply.
  * This makes the reference's CDC mode executable offline — the
  * capture side is DRIVEN, not just modeled. */
case class ClogItem(id: Long, name: String, qty: Long)

class ChangelogCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("JSONEachRow changelog directory drives CdcApply to the live state") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_changelog")
    dir.toFile.deleteOnExit()

    def drop(name: String, lines: String*): Unit = {
      // write-then-rename so the file source never reads a partial file
      val tmp = dir.resolve(s".$name.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, dir.resolve(name))
    }

    // batch 1: the snapshot-ish initial inserts
    drop("000001.json",
      """{"op":"c","after":{"id":1,"name":"widget","qty":10},"source":{"lsn":1,"ts_ms":1000}}""",
      """{"op":"c","after":{"id":2,"name":"gadget","qty":5},"source":{"lsn":2,"ts_ms":1001}}""",
      """{"op":"c","after":{"id":3,"name":"doodad","qty":7},"source":{"lsn":3,"ts_ms":1002}}""")

    val changes = ChangelogSource.typedChanges[Long, ClogItem](
      spark, dir.toString, "id BIGINT, name STRING, qty BIGINT", "id")
    val q = CdcApply.latestByKey(changes)
      .writeStream.format("memory").queryName("clog_out")
      .outputMode(OutputMode.Update).start()
    try {
      q.processAllAvailable()
      def state(): Map[Long, Materialized[Long, ClogItem]] =
        spark.table("clog_out").as[Materialized[Long, ClogItem]].collect()
          .groupBy(_.key).map { case (k, ms) => k -> ms.maxBy(_.version) }
      val s1 = state()
      assert(s1(1L) == Materialized(1L, 1L, deleted = false, ClogItem(1, "widget", 10)))
      assert(s1.keySet == Set(1L, 2L, 3L))

      // batch 2: an update, a delete, and a stale out-of-order replay
      drop("000002.json",
        """{"op":"u","before":{"id":1,"name":"widget","qty":10},"after":{"id":1,"name":"widget","qty":42},"source":{"lsn":5,"ts_ms":2000}}""",
        """{"op":"d","before":{"id":2,"name":"gadget","qty":5},"source":{"lsn":6,"ts_ms":2001}}""",
        """{"op":"c","after":{"id":3,"name":"stale","qty":0},"source":{"lsn":2,"ts_ms":900}}""")
      q.processAllAvailable()
      val s2 = state()
      // update applied
      assert(s2(1L) == Materialized(1L, 5L, deleted = false, ClogItem(1, "widget", 42)))
      // tombstone carried with the last known image
      assert(s2(2L) == Materialized(2L, 6L, deleted = true, ClogItem(2, "gadget", 5)))
      // stale lsn 2 < applied lsn 3: ignored
      assert(s2(3L) == Materialized(3L, 3L, deleted = false, ClogItem(3, "doodad", 7)))
      // the ReplacingMergeTree-FINAL view = live rows only
      assert(s2.values.filterNot(_.deleted).map(_.key).toSet == Set(1L, 3L))
    } finally q.stop()
  }
}
