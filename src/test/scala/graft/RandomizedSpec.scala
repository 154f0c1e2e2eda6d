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

  test("sequenceMatch DP equals brute force over random streams, all pattern atoms") {
    sealed trait Gap
    case object Adj extends Gap
    case object AnyG extends Gap
    case class TGap(op: String, us: Long) extends Gap
    case class Step(cond: Int, gap: Gap) // cond −1 = '.'

    // brute force: try every placement of step 0, extend recursively
    // honoring the gap kind and strict timestamp increase
    def brute(evs: IndexedSeq[(Long, Int)], steps: Seq[Step]): Boolean = {
      def holds(op: String, dt: Long, b: Long) = op match {
        case "<=" => dt <= b; case "<" => dt < b
        case ">=" => dt >= b; case ">" => dt > b; case _ => dt == b
      }
      def condOk(s: Step, i: Int) = s.cond < 0 || (evs(i)._2 & (1 << s.cond)) != 0
      def rec(si: Int, prev: Int): Boolean =
        si == steps.length || (steps(si) match {
          case st @ Step(_, Adj) =>
            prev + 1 < evs.length && evs(prev + 1)._1 > evs(prev)._1 &&
              condOk(st, prev + 1) && rec(si + 1, prev + 1)
          case st @ Step(_, AnyG) =>
            ((prev + 1) until evs.length).exists(i =>
              evs(i)._1 > evs(prev)._1 && condOk(st, i) && rec(si + 1, i))
          case st @ Step(_, TGap(op, b)) =>
            ((prev + 1) until evs.length).exists(i =>
              evs(i)._1 > evs(prev)._1 && holds(op, evs(i)._1 - evs(prev)._1, b) &&
                condOk(st, i) && rec(si + 1, i))
        })
      evs.indices.exists(i => condOk(steps.head, i) && rec(1, i))
    }

    val rnd = new scala.util.Random(20260813L)
    val baseMs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // 4 event kinds: a/b/c are conditions 1..3, z matches nothing;
    // timestamps over 12 s with deliberate equal-ts collisions
    val events = (1L to 40L).flatMap { u =>
      Seq.fill(4 + rnd.nextInt(7)) {
        (u, new java.sql.Timestamp(baseMs + rnd.nextInt(12) * 1000L),
          "abcz".charAt(rnd.nextInt(4)).toString)
      }
    }
    events.toDF("user_id", "ts", "etype").repartition(5)
      .createOrReplaceTempView("rnd_seq")
    def mask(e: String) = e match { case "a" => 1; case "b" => 2; case "c" => 4; case _ => 0 }
    val byUser = events.groupBy(_._1).view.mapValues(
      _.map(e => ((baseMs / 1000 * 1000000L) + (e._2.getTime - baseMs) * 1000L, mask(e._3)))).toMap

    val sec = 1000000L
    val patterns = Seq(
      "(?1).*(?2)"        -> Seq(Step(0, Adj), Step(1, AnyG)),
      "(?1)(?2)"          -> Seq(Step(0, Adj), Step(1, Adj)),
      "(?1).(?2)"         -> Seq(Step(0, Adj), Step(-1, Adj), Step(1, Adj)),
      "(?1)(?t<=5)(?2)"   -> Seq(Step(0, Adj), Step(1, TGap("<=", 5 * sec))),
      "(?1)(?t>3)(?3)"    -> Seq(Step(0, Adj), Step(2, TGap(">", 3 * sec))),
      "(?2)(?t>=4)(?1)"   -> Seq(Step(1, Adj), Step(0, TGap(">=", 4 * sec))),
      "(?1)(?t==5)(?2)"   -> Seq(Step(0, Adj), Step(1, TGap("==", 5 * sec))),
      "(?1).*(?2).(?3)"   -> Seq(Step(0, Adj), Step(1, AnyG), Step(-1, Adj), Step(2, Adj)),
      "(?3)(?t<7)(?2).*(?1)" -> Seq(Step(2, Adj), Step(1, TGap("<", 7 * sec)), Step(0, AnyG)),
    )
    for ((pat, steps) <- patterns) {
      val got = spark.sql(
        s"""SELECT user_id, sequenceMatch('$pat')(ts,
             etype = 'a', etype = 'b', etype = 'c') AS m
            FROM rnd_seq GROUP BY user_id""").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val hasDot = steps.exists(_.cond < 0)
      for ((u, raw) <- byUser) {
        // mirror the buffer discipline: no-dot patterns see only
        // condition-matching events; dotted patterns see the full stream
        val evs = raw.filter(e => hasDot || e._2 != 0).sorted.toIndexedSeq
        assert(got(u) == brute(evs, steps), s"pattern $pat user $u events $evs")
      }

      // sequenceCount: independent greedy re-derivation (earliest
      // start, earliest feasible extension, resume after match end)
      val gotN = spark.sql(
        s"""SELECT user_id, sequenceCount('$pat')(ts,
             etype = 'a', etype = 'b', etype = 'c') AS n
            FROM rnd_seq GROUP BY user_id""").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def condOk(s: Step, evs: IndexedSeq[(Long, Int)], i: Int) =
        s.cond < 0 || (evs(i)._2 & (1 << s.cond)) != 0
      def holds(op: String, dt: Long, b: Long) = op match {
        case "<=" => dt <= b; case "<" => dt < b
        case ">=" => dt >= b; case ">" => dt > b; case _ => dt == b
      }
      def greedyCount(evs: IndexedSeq[(Long, Int)]): Long = {
        var count = 0L
        var pos = 0
        while (pos < evs.length) {
          val end = (pos until evs.length).iterator.map { start =>
            if (!condOk(steps.head, evs, start)) -1
            else steps.drop(1).foldLeft(start) { (prev, st) =>
              if (prev < 0) -1
              else st.gap match {
                case Adj =>
                  if (prev + 1 < evs.length && evs(prev + 1)._1 > evs(prev)._1 &&
                      condOk(st, evs, prev + 1)) prev + 1 else -1
                case AnyG =>
                  ((prev + 1) until evs.length)
                    .find(i => evs(i)._1 > evs(prev)._1 && condOk(st, evs, i)).getOrElse(-1)
                case TGap(op, b) =>
                  ((prev + 1) until evs.length)
                    .find(i => evs(i)._1 > evs(prev)._1 &&
                      holds(op, evs(i)._1 - evs(prev)._1, b) && condOk(st, evs, i))
                    .getOrElse(-1)
              }
            }
          }.find(_ >= 0)
          end match {
            case Some(last) => count += 1; pos = last + 1
            case None       => pos = evs.length
          }
        }
        count
      }
      for ((u, raw) <- byUser) {
        val evs = raw.filter(e => hasDot || e._2 != 0).sorted.toIndexedSeq
        assert(gotN(u) == greedyCount(evs), s"count pattern $pat user $u events $evs")
      }
    }
  }

  test("string-distance kernels: metric properties on random strings") {
    import graft.plans.StringDistanceKernels._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val rnd = new scala.util.Random(77L)
    def randStr() = {
      val n = rnd.nextInt(12)
      new String(Array.fill(n)(('a' + rnd.nextInt(4)).toChar))
    }
    (1 to 300).foreach { _ =>
      val (a, b) = (randStr(), randStr())
      val j = jaro(u8(a), u8(b))
      assert(j >= 0.0 && j <= 1.0)
      assert(j == jaro(u8(b), u8(a)), s"jaro asymmetric on '$a'/'$b'")
      val jw = jaroWinkler(u8(a), u8(b))
      assert(jw >= j - 1e-12 && jw <= 1.0, s"winkler below jaro on '$a'/'$b'")
      val dl = damerauLevenshtein(u8(a), u8(b))
      assert(dl == damerauLevenshtein(u8(b), u8(a)))
      // DL is bounded by plain Levenshtein (transpositions only help)
      val lev = {
        val (x, y) = (a, b)
        val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x.charAt(i - 1) == y.charAt(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      assert(dl <= lev, s"DL $dl > lev $lev on '$a'/'$b'")
      assert((dl == 0) == (a == b))
      val bh = byteHamming(u8(a), u8(b))
      assert(bh >= math.abs(a.length - b.length))
      val sx = soundex(u8(a)).toString
      assert(sx.isEmpty || (sx.length == 4 && sx.head.isLetter))
    }
  }

  test("codec kernels: round trips on random input") {
    import graft.plans.EncodingKernels._
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val rnd = new scala.util.Random(78L)
    (1 to 200).foreach { _ =>
      val ascii = new String(Array.fill(rnd.nextInt(20))((32 + rnd.nextInt(95)).toChar))
      assert(base58Decode(base58Encode(u8(ascii))).toString == ascii)
      assert(base64UrlDecode(base64UrlEncode(u8(ascii))).toString == ascii)
      val uni = new String(Array.fill(rnd.nextInt(12))(
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar else (0xC0 + rnd.nextInt(0x500)).toChar))
      assert(punycodeDecode(punycodeEncode(u8(uni))).toString == uni, s"punycode round trip '$uni'")
    }
  }

  test("readable-size round trip and hash determinism on random values") {
    val rnd = new scala.util.Random(79L)
    val vals = Seq.fill(50)(math.abs(rnd.nextLong()) % 1000000000000L + 1)
    val df = vals.toDF("b").selectExpr(
      "b", "parseReadableSize(formatReadableSize(b)) AS rt", "xxHash32(CAST(b AS STRING)) AS h32")
    df.collect().foreach { r =>
      val (b, rt) = (r.getLong(0), r.getLong(1))
      // formatReadableSize keeps 2 decimals, so the round trip is within 0.5%
      assert(math.abs(rt - b).toDouble / b < 0.005, s"$b -> $rt")
      val h = r.getLong(2)
      assert(h >= 0 && h <= 0xFFFFFFFFL)
    }
  }

  test("projection auto-use equals the base aggregation on random tables and queries") {
    val rnd = new scala.util.Random(20260814L)
    spark.sql("DROP TABLE IF EXISTS rnd_proj_t")
    val loc = new java.io.File("spark-warehouse/rnd_proj_t")
    if (loc.exists()) {
      java.nio.file.Files.walk(loc.toPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(pp => java.nio.file.Files.deleteIfExists(pp))
    }
    spark.sql("""CREATE TABLE rnd_proj_t (g1 String, g2 UInt32, a Int64, b Float64)
                 ENGINE = MergeTree ORDER BY g1""")
    val rows = Seq.tabulate(400)(_ =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(4), rnd.nextInt(1000).toLong, rnd.nextInt(10000) / 100.0))
    rows.toDF("g1", "g2", "a", "b").createOrReplaceTempView("rnd_proj_src")
    spark.sql("INSERT INTO rnd_proj_t SELECT * FROM rnd_proj_src")
    spark.sql("""ALTER TABLE rnd_proj_t ADD PROJECTION rp
                 (SELECT g1, g2, count(), sum(a), min(b), max(b), sum(b) GROUP BY g1, g2)""")
    val queries = Seq(
      "SELECT g1, g2, count(*) AS c, sum(a) AS sa FROM rnd_proj_t GROUP BY g1, g2 ORDER BY g1, g2",
      "SELECT g2, g1, max(b) AS mb, min(b) AS nb, round(sum(b), 2) AS sb FROM rnd_proj_t GROUP BY g2, g1 ORDER BY g2, g1",
      "SELECT g1, g2, sum(a) * 2 + count(*) AS mix FROM rnd_proj_t WHERE g1 <> 'k3' GROUP BY g1, g2 ORDER BY g1, g2",
      "SELECT g1, g2, count(*) AS c FROM rnd_proj_t WHERE g2 >= 2 GROUP BY g1, g2 ORDER BY g1, g2",
    )
    queries.foreach { q =>
      val withProj = spark.sql(q)
      assert(withProj.queryExecution.executedPlan.toString.contains("_graft_proj_rp"),
        s"projection should engage for: $q")
      val got = withProj.collect().map(_.toSeq).toSeq
      spark.conf.set("spark.graft.projections.autoUse", "false")
      val want = try spark.sql(q).collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.graft.projections.autoUse", "true")
      assert(got == want, s"projection rewrite changed results for: $q")
    }
    // non-matching shapes must not engage: avg, distinct, non-key filter, subset keys
    Seq(
      "SELECT g1, g2, avg(b) AS ab FROM rnd_proj_t GROUP BY g1, g2",
      "SELECT g1, g2, count(DISTINCT a) AS d FROM rnd_proj_t GROUP BY g1, g2",
      "SELECT g1, g2, count(*) AS c FROM rnd_proj_t WHERE a > 100 GROUP BY g1, g2",
      "SELECT g1, count(*) AS c FROM rnd_proj_t GROUP BY g1",
    ).foreach { q =>
      assert(!spark.sql(q).queryExecution.executedPlan.toString.contains("_graft_proj_rp"),
        s"projection must not engage for: $q")
    }
    spark.sql("DROP TABLE rnd_proj_t")
  }

  test("PASTE JOIN zip equals the Scala reference zip on random tables") {
    val rnd = new scala.util.Random(2026L)
    val left = Seq.tabulate(40)(i => (i.toLong, rnd.nextInt(1000)))
    val right = Seq.tabulate(25)(i => (i.toLong, rnd.alphanumeric.take(5).mkString))
    left.toDF("lid", "lv").createOrReplaceTempView("rnd_pj_l")
    right.toDF("rid", "rv").createOrReplaceTempView("rnd_pj_r")
    val out = spark.sql(
      """SELECT * FROM
         (SELECT lid, lv FROM rnd_pj_l ORDER BY lv, lid)
         PASTE JOIN
         (SELECT rid, rv FROM rnd_pj_r ORDER BY rv DESC, rid)""").collect()
    val expL = left.sortBy(p => (p._2, p._1))
    val expR = right.sortBy(p => (p._2, p._1.toInt))(
      Ordering.Tuple2(Ordering.String.reverse, Ordering.Int))
    val expected = expL.zip(expR).map { case ((lid, lv), (rid, rv)) => (lid, lv, rid, rv) }.toSet
    assert(out.length == 25) // shorter side
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSet == expected)
  }

  test("semanticDedup survivorship is exactly the within-bucket lower-id rule") {
    val rnd = new scala.util.Random(99L)
    val dim = 8
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    for (i <- 0 until 120) {
      if (i % 3 == 0 && buf.nonEmpty) {
        // near-dup of an earlier vector with tiny jitter
        val (_, b) = buf(rnd.nextInt(buf.length))
        buf += ((i.toLong, b.map(v => v + (rnd.nextGaussian() * 0.001).toFloat)))
      } else buf += ((i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    }
    val vecs = buf.toSeq
    val out = graft.operators.Similarity.semanticDedup(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        numPlanes = 5, dim = dim, minCos = 0.98)
      .collect().map(r => (r.getLong(1), r.getBoolean(2))).toMap // id -> survived
    // Scala reference with the IDENTICAL double fold order + HALF_UP
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val planes = (0 until 5).map(j => graft.operators.Similarity.formulaPlane(j, dim))
    val dv = vecs.map { case (id, a) => id -> a.map(_.toDouble) }
    val bucket = dv.map { case (id, v) =>
      id -> (0 until 5).map(j => if (dot(v, planes(j)) >= 0) 1L << j else 0L).sum
    }.toMap
    def cosR(a: Array[Double], b: Array[Double]): Double =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectedDropped = dv.map(_._1).filter { id =>
      val v = dv.find(_._1 == id).get._2
      dv.exists { case (id2, v2) =>
        id2 < id && bucket(id2) == bucket(id) && cosR(v2, v) >= 0.98 }
    }.toSet
    assert(expectedDropped.nonEmpty, "fixture should contain droppable near-dups")
    assert(out.filter(!_._2).keySet == expectedDropped)
  }

  test("minhashOraclePairs: identical docs agree on all 16; disjoint docs are no candidates") {
    val rnd = new scala.util.Random(5L)
    def doc(words: Seq[String]) = words.mkString(" ")
    val vocabA = Seq.tabulate(30)(i => s"alpha$i")
    val vocabB = Seq.tabulate(30)(i => s"beta$i")
    val a1 = doc(Seq.fill(40)(vocabA(rnd.nextInt(vocabA.size))))
    val b1 = doc(Seq.fill(40)(vocabB(rnd.nextInt(vocabB.size))))
    val docs = Seq((1L, a1), (2L, a1), (3L, b1)).toDF("doc_id", "norm")
    val pairs = graft.operators.Dedup.minhashOraclePairs(
        docs, "doc_id", "norm", k = 16, ngram = 3, minMatch = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.get((1L, 2L)).contains(16L), s"identical docs must agree on all 16: $pairs")
    // disjoint vocabularies share no shingles → no band can collide
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
