package graft

import org.apache.spark.sql.functions._

/** Randomized cross-checks for the round-12 features (seeded —
  * failures reproduce): the ASOF SQL rewrite's union+window shape
  * against BOTH an independent Scala reference and the
  * [[graft.operators.AsofJoin]] operator it claims to mirror. */
class Round12FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: ASOF SQL rewrite equals the Scala reference for all four inequality forms") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 6) {
      val nKeys = 1 + rnd.nextInt(4)
      // unique (key, ts) per side: ties at equal right timestamps are
      // CH-unspecified, so the fuzz keeps inputs tie-free by design
      def side(tag: String): Seq[(Long, Long, String)] = {
        val seen = scala.collection.mutable.Set[(Long, Long)]()
        Seq.fill(8 + rnd.nextInt(10)) {
          var kt = (rnd.nextInt(nKeys).toLong, (rnd.nextInt(40) * 3).toLong)
          while (seen.contains(kt)) kt = (rnd.nextInt(nKeys).toLong, (rnd.nextInt(200) * 3).toLong)
          seen += kt
          (kt._1, kt._2, s"$tag${kt._1}_${kt._2}")
        }
      }
      val probes = side("p")
      val rights = side("r")
      probes.toDF("k", "ts", "pv").createOrReplaceTempView("fz_probe")
      rights.toDF("k", "ts", "rv").createOrReplaceTempView("fz_right")
      for (op <- Seq(">=", ">", "<=", "<")) {
        val got = spark.sql(
          s"""SELECT p.pv, c.rv FROM fz_probe p ASOF LEFT JOIN fz_right c
             |ON p.k = c.k AND p.ts $op c.ts ORDER BY p.pv""".stripMargin)
          .collect().map(r => (r.getString(0), Option(r.getString(1)).orNull)).toSeq
        val want = probes.sortBy(_._3).map { case (k, ts, pv) =>
          val cand = rights.filter(r => r._1 == k && (op match {
            case ">=" => ts >= r._2
            case ">"  => ts > r._2
            case "<=" => ts <= r._2
            case "<"  => ts < r._2
          }))
          val best =
            if (op.startsWith(">")) cand.sortBy(_._2).lastOption  // latest before
            else cand.sortBy(_._2).headOption                     // earliest after
          (pv, best.map(_._3).orNull)
        }
        assert(got == want, s"trial $trial op $op:\n got=$got\nwant=$want")
      }
    }
  }

  test("fuzz: ASOF SQL text agrees with the AsofJoin operator on the shared form") {
    val rnd = new scala.util.Random(77L)
    for (trial <- 0 until 4) {
      val probes = Seq.tabulate(12) { i =>
        (rnd.nextInt(3).toLong, (rnd.nextInt(50) * 2).toLong, i.toLong) }
      val rights0 = Seq.tabulate(15) { i =>
        (rnd.nextInt(3).toLong, (rnd.nextInt(50) * 2).toLong, 100L + i) }
      // operator convention: right deduped per (key, time), max tiebreak wins
      val rights = rights0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val l = probes.toDF("k", "ts", "pid")
      val r = rights.toDF("k", "ts", "rid")
      l.createOrReplaceTempView("fz2_l"); r.createOrReplaceTempView("fz2_r")
      val viaSql = spark.sql(
        """SELECT l.pid, c.rid FROM fz2_l l ASOF LEFT JOIN fz2_r c
          |ON l.k = c.k AND l.ts >= c.ts ORDER BY l.pid""".stripMargin)
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq
      val viaOp = graft.operators.AsofJoin.join(l, r, Seq("k"), "ts", "rid", Seq("rid"))
        .orderBy("pid").collect()
        .map(x => (x.getAs[Long]("pid"),
          Option(x.getAs[Any]("right_rid")).map(_.asInstanceOf[Long]).getOrElse(-1L))).toSeq
      assert(viaSql == viaOp, s"trial $trial:\n sql=$viaSql\n op=$viaOp")
    }
  }
}
