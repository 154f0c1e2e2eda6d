package graft

import graft.streaming.{CdcApply, Change, Materialized}
import org.apache.spark.sql.functions._

/** Seeded randomized cross-checks: operators vs brute-force reference
  * implementations on generated data. */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("AsofJoin equals the brute-force temporal match on random data") {
    val rnd = new scala.util.Random(20260812L)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min.toLong * 60000)
    val quotes = Seq.tabulate(300)(i => (rnd.nextInt(8).toLong, ts(rnd.nextInt(500)), i.toLong, rnd.nextInt(1000).toDouble))
    val trades = Seq.tabulate(200)(i => (rnd.nextInt(10).toLong, ts(rnd.nextInt(500)), (1000 + i).toLong))

    val out = graft.operators.AsofJoin.join(
        trades.toDF("k", "ts", "tid"), quotes.toDF("k", "ts", "qid", "px"),
        Seq("k"), "ts", tiebreakCol = "qid", rightCols = Seq("qid"))
      .select("tid", "right_qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    trades.foreach { case (k, t, tid) =>
      val expected = quotes.filter(q => q._1 == k && !q._2.after(t))
        .sortBy(q => (q._2.getTime, q._3)).lastOption.map(_._3)
      assert(out(tid) == expected, s"trade $tid key $k time $t")
    }
  }

  test("CdcApply batch result is invariant under input order") {
    val rnd = new scala.util.Random(42L)
    val changes = Seq.tabulate(500) { i =>
      Change(rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, rnd.nextBoolean(), s"v$i")
    }
    // make versions unique per key so the winner is well-defined
    val uniq = changes.groupBy(c => (c.key, c.version)).values.map(_.head).toSeq
    val a = CdcApply.latestByKey(uniq.toDS()).collect().toSet
    val b = CdcApply.latestByKey(rnd.shuffle(uniq).toDS()).collect().toSet
    assert(a == b)
    // and equals the brute-force winner
    val expected = uniq.groupBy(_.key).map { case (k, cs) =>
      val w = cs.maxBy(_.version)
      Materialized(k, w.version, w.deleted, w.value)
    }.toSet
    assert(a == expected)
  }

  test("sessionize session count = 1 + gaps for every user on random data") {
    val rnd = new scala.util.Random(7L)
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val events = Seq.tabulate(400)(i =>
      (rnd.nextInt(6).toLong, new java.sql.Timestamp(base.getTime + rnd.nextInt(100000).toLong * 1000), i.toLong))
    val gapS = 900L
    val got = graft.operators.Events.sessionize(events.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id", gapSeconds = gapS)
      .groupBy("user_id").agg(max("session_idx").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    events.groupBy(_._1).foreach { case (u, es) =>
      val times = es.map(_._2.getTime).sorted
      val expected = 1 + times.zip(times.tail).count { case (a, b) => b - a > gapS * 1000 }
      assert(got(u) == expected, s"user $u")
    }
  }
}
