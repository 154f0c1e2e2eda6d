package graft

import org.apache.spark.sql.functions._

/** Randomized cross-checks for the round-12 features (seeded —
  * failures reproduce): the ASOF SQL rewrite's union+window shape
  * against BOTH an independent Scala reference and the
  * [[graft.operators.AsofJoin]] operator it claims to mirror, plus
  * the round's new kernels (hasSubsequence, arrayLevenshteinDistance,
  * bitSlice, H3 parent/children algebra, convex hull) against
  * independent brute-force references. */
class Round12FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: hasSubsequence equals the exhaustive reference") {
    val rnd = new scala.util.Random(1201L)
    // exhaustive check: is needle obtainable by deleting chars of hay
    def ref(hay: String, needle: String): Boolean = {
      if (needle.isEmpty) true
      else if (hay.isEmpty) false
      else if (hay.head == needle.head) ref(hay.tail, needle.tail)
      else ref(hay.tail, needle)
    }
    val cases = Seq.fill(300) {
      val hay = Seq.fill(rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar).mkString
      val needle = Seq.fill(rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString
      (hay, needle)
    }
    val got = cases.toDF("h", "n")
      .selectExpr("hasSubsequence(h, n) AS r").collect().map(_.getBoolean(0))
    cases.zip(got).foreach { case ((h, n), g) =>
      assert(g == ref(h, n), s"hasSubsequence('$h', '$n')")
    }
  }

  test("fuzz: arrayLevenshteinDistance equals a textbook full-matrix DP") {
    val rnd = new scala.util.Random(1202L)
    def ref(a: Seq[Int], b: Seq[Int]): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cases = Seq.fill(200) {
      (Seq.fill(rnd.nextInt(10))(rnd.nextInt(4)), Seq.fill(rnd.nextInt(10))(rnd.nextInt(4)))
    }
    val got = cases.toDF("a", "b")
      .selectExpr("arrayLevenshteinDistance(a, b) AS r").collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == ref(a, b), s"arrayLevenshteinDistance($a, $b)")
    }
  }

  test("fuzz: bitSlice equals a bit-string reference for every offset/length") {
    val rnd = new scala.util.Random(1203L)
    def bits(bytes: Array[Byte]): String =
      bytes.map(b => String.format("%8s", Integer.toBinaryString(b & 0xFF)).replace(' ', '0')).mkString
    def packed(bitStr: String): Seq[Byte] =
      bitStr.grouped(8).map(g => Integer.parseInt(g.padTo(8, '0'), 2).toByte).toSeq
    for (_ <- 0 until 120) {
      val s = Seq.fill(1 + rnd.nextInt(4))(('A' + rnd.nextInt(26)).toChar).mkString
      val total = s.getBytes.length * 8
      val off = rnd.nextInt(2 * total + 4) - total - 2   // exercises both signs and out-of-range
      val len = rnd.nextInt(2 * total + 4) - total - 2
      val useLen = rnd.nextBoolean()
      val sql = if (useLen) s"bitSlice('$s', $off, $len)" else s"bitSlice('$s', $off)"
      val got = spark.sql(s"SELECT $sql AS v").collect().head.getAs[Array[Byte]](0).toSeq
      // reference over the explicit bit string (offset 0 behaves as 1
      // — CH's 1-based convention with a clamped start)
      val b = bits(s.getBytes)
      val start0 = (if (off > 0) off - 1 else total + off).max(0)
      val end0 = (if (!useLen) total
                  else if (len >= 0) (start0 + len).min(total)
                  else (total + len).max(start0)).min(total)
      val want = if (start0 >= total || end0 <= start0) Seq.empty[Byte]
                 else packed(b.substring(start0, end0))
      assert(got == want, s"$sql (bits=$b)")
    }
  }

  test("fuzz: H3 parent/children algebra holds for random valid cells") {
    val rnd = new scala.util.Random(1204L)
    import graft.plans.H3Kernels
    for (_ <- 0 until 200) {
      val res = 1 + rnd.nextInt(9)
      val base = rnd.nextInt(122)
      var h = (1L << 59) | (res.toLong << 52) | (base.toLong << 45)
      var firstNonZero = 0
      for (r <- 1 to 15) {
        val d = if (r <= res) rnd.nextInt(7) else 7
        if (r <= res && d != 0 && firstNonZero == 0) firstNonZero = d
        h |= d.toLong << (45 - 3 * r)
      }
      // regenerate K-leading pentagon digits into validity
      if (!H3Kernels.isValid(h)) {
        assert(firstNonZero == 1) // the only failure mode this generator can hit
      } else {
        assert(H3Kernels.resolution(h) == res)
        val up = H3Kernels.toParent(h, res - 1)
        assert(H3Kernels.isValid(up) && H3Kernels.resolution(up) == res - 1)
        val kids = H3Kernels.toChildren(up, res)
        assert(kids.contains(h), s"children of parent must contain the cell")
        assert(kids.length == (if (H3Kernels.isPentagon(up)) 6 else 7))
        kids.foreach { k =>
          assert(H3Kernels.isValid(k), s"child ${k.toHexString} of ${up.toHexString}")
          assert(H3Kernels.toParent(k, res - 1) == up)
        }
      }
    }
  }

  test("fuzz: convex hull contains every input point and is convex") {
    val rnd = new scala.util.Random(1205L)
    import graft.plans.WktKernels
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    for (_ <- 0 until 60) {
      val pts: Array[(Double, Double)] =
        Array.fill(3 + rnd.nextInt(20))((rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
      val hull = WktKernels.convexHull(Array(pts))
      val ring = hull.dropRight(1)
      if (ring.length >= 3) {
        // strictly convex: every consecutive triple turns the same way
        val turns = ring.indices.map { i =>
          cross(ring(i), ring((i + 1) % ring.length), ring((i + 2) % ring.length))
        }
        assert(turns.forall(_ > 0) || turns.forall(_ < 0), s"hull not convex: ${ring.toSeq}")
        // every input point inside or on the hull (same-side test)
        val sign = if (turns.head > 0) 1 else -1
        pts.foreach { p =>
          val ok = ring.indices.forall { i =>
            sign * cross(ring(i), ring((i + 1) % ring.length), p) >= -1e-9
          }
          assert(ok, s"point $p outside hull ${ring.toSeq}")
        }
      }
    }
  }

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
