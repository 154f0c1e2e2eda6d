package graft

/** Round-7 dialect surface: the QUALIFY clause and the long-tail
  * function batches (bitmaps, stats, quantile variants, array tail).
  * Shapes a SQL oracle can't pin (loud-failure contracts, literal
  * guards) are pinned here. */
class DialectRound7Spec extends SparkSpec {
  import spark.implicits._

  private def viewT(): Unit =
    spark.sql("CREATE OR REPLACE TEMP VIEW qual_t AS SELECT * FROM VALUES " +
      "(1, 10), (1, 20), (1, 30), (2, 5), (2, 40) v(k, x)")

  test("QUALIFY: predicate referencing a window alias, with ORDER BY + LIMIT tail") {
    viewT()
    val rows = spark.sql(
      """SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY x DESC) AS rn
         FROM qual_t QUALIFY rn <= 2 ORDER BY k, rn LIMIT 3""").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1, 30, 1), (1, 20, 2), (2, 40, 1)))
  }

  test("QUALIFY: inline window call in the predicate, marker column dropped") {
    viewT()
    val df = spark.sql(
      """SELECT k, x FROM qual_t
         QUALIFY row_number() OVER (PARTITION BY k ORDER BY x) = 1 ORDER BY k""")
    assert(df.columns.toSeq == Seq("k", "x")) // gr_qf__ must not leak
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 10), (2, 5)))
  }

  test("QUALIFY: after GROUP BY, window over the aggregate") {
    viewT()
    val rows = spark.sql(
      """SELECT k, sum(x) AS sx FROM qual_t GROUP BY k
         QUALIFY rank() OVER (ORDER BY sum(x) DESC) = 1""").collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((1, 60L)))
  }

  test("QUALIFY: keyword inside a string literal is untouched") {
    val r = spark.sql("SELECT 'a QUALIFY b' AS s, 1 AS one").head()
    assert(r.getString(0) == "a QUALIFY b" && r.getInt(1) == 1)
  }

  test("bitmap scalar algebra: build/and/or/xor/andnot, subsets, predicates") {
    val r = spark.sql(
      """SELECT bitmapToArray(bitmapBuild(array(3, 1, 2, 3, 1))) AS built,
                bitmapAnd(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS a,
                bitmapOr(array(1L, 2L), array(2L, 4L)) AS o,
                bitmapXor(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS x,
                bitmapAndnot(array(1L, 2L, 3L), array(2L, 9L)) AS an,
                bitmapAndCardinality(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ac,
                bitmapOrCardinality(array(1L, 2L), array(2L, 4L)) AS oc,
                bitmapXorCardinality(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS xc,
                bitmapAndnotCardinality(array(1L, 2L, 3L), array(2L, 9L)) AS anc,
                bitmapContains(array(1L, 5L), 5) AS c5,
                bitmapHasAll(array(1L, 2L, 3L), array(2L, 3L)) AS hall,
                bitmapHasAny(array(1L, 2L), array(9L)) AS hany,
                bitmapMin(array(4L, 2L, 9L)) AS mn,
                bitmapMax(array(4L, 2L, 9L)) AS mx,
                bitmapSubsetInRange(array(1L, 3L, 5L, 7L), 3, 7) AS rng,
                bitmapSubsetLimit(array(1L, 3L, 5L, 7L), 3, 2) AS lim,
                subBitmap(array(1L, 3L, 5L, 7L), 1, 2) AS sub""").head()
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(r.getSeq[Long](1) == Seq(2L, 3L) && r.getSeq[Long](2) == Seq(1L, 2L, 4L))
    assert(r.getSeq[Long](3) == Seq(1L, 4L) && r.getSeq[Long](4) == Seq(1L, 3L))
    assert(r.getLong(5) == 2L && r.getLong(6) == 3L && r.getLong(7) == 2L && r.getLong(8) == 2L)
    assert(r.getBoolean(9) && r.getBoolean(10) && !r.getBoolean(11))
    assert(r.getLong(12) == 2L && r.getLong(13) == 9L)
    assert(r.getSeq[Long](14) == Seq(3L, 5L))
    assert(r.getSeq[Long](15) == Seq(3L, 5L))
    assert(r.getSeq[Long](16) == Seq(3L, 5L))
  }

  test("bitmap group folds: or/and/xor over states, scalar build, no-input identity") {
    spark.sql("CREATE OR REPLACE TEMP VIEW bm_t AS SELECT * FROM VALUES " +
      "(1, 1), (1, 2), (1, 2), (2, 2), (2, 3), (3, 2), (3, 5) v(g, x)")
    val st = spark.sql(
      """SELECT groupBitmap(x) AS card, groupBitmapState(x) AS bm
         FROM bm_t WHERE g = 1""").head()
    assert(st.getLong(0) == 2L && st.getSeq[Long](1) == Seq(1L, 2L))
    // fold the three per-g bitmaps {1,2} {2,3} {2,5}: or = {1,2,3,5},
    // and = {2}, xor = odd-membership = {1,2,3,5} (2 appears 3×)
    val folded = spark.sql(
      """WITH s AS (SELECT g, groupBitmapState(x) AS bm FROM bm_t GROUP BY g)
         SELECT groupBitmapOr(bm) AS oc, groupBitmapAnd(bm) AS ac, groupBitmapXor(bm) AS xc,
                groupBitmapOrState(bm) AS os, groupBitmapAndState(bm) AS as_, groupBitmapXorState(bm) AS xs
         FROM s""").head()
    assert(folded.getLong(0) == 4L && folded.getLong(1) == 1L && folded.getLong(2) == 4L)
    assert(folded.getSeq[Long](3) == Seq(1L, 2L, 3L, 5L))
    assert(folded.getSeq[Long](4) == Seq(2L))
    assert(folded.getSeq[Long](5) == Seq(1L, 2L, 3L, 5L))
    // xor parity ignores duplicates WITHIN one bitmap (set semantics per input)
    val dup = spark.sql(
      "SELECT groupBitmapXorState(bm) AS xs FROM VALUES (array(1L, 1L, 2L)), (array(2L)) v(bm)").head()
    assert(dup.getSeq[Long](0) == Seq(1L))
    // and over zero inputs is empty, not an error
    val empty = spark.sql("SELECT groupBitmapAnd(bm) AS c FROM (SELECT array(1L) AS bm) WHERE false").head()
    assert(empty.getLong(0) == 0L)
  }

  test("skewSamp/kurtSamp: n-1 central moments over matching stddev power") {
    // [1,2,3,4,10]: mean 4, devs (-3,-2,-1,0,6); m3s = 180/4 = 45,
    // varS = 50/4 = 12.5, m4s = 1394/4 = 348.5
    val r = spark.sql(
      "SELECT skewSamp(v) AS sk, kurtSamp(v) AS ku FROM VALUES (1), (2), (3), (4), (10) t(v)").head()
    assert(math.abs(r.getDouble(0) - 45.0 / math.pow(12.5, 1.5)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 348.5 / (12.5 * 12.5)) < 1e-12)
  }

  test("analysisOfVariance: one-way F statistic, group-keyed O(k) buffer") {
    // groups (1,2,3), (3,4,5), (6,8): T = 12+48+98 = 158, S = 32, n = 8,
    // Q = 164 → between = 15, within = 1.2, F = 12.5
    val r = spark.sql(
      """SELECT analysisOfVariance(v, g) AS f FROM VALUES
         (1.0, 0), (2.0, 0), (3.0, 0), (3.0, 1), (4.0, 1), (5.0, 1), (6.0, 2), (8.0, 2) t(v, g)""").head()
    assert(math.abs(r.getDouble(0) - 12.5) < 1e-12)
    // fewer than two groups → NULL, not a crash
    assert(spark.sql("SELECT analysisOfVariance(v, 0) AS f FROM VALUES (1.0), (2.0) t(v)").head().isNullAt(0))
  }

  test("exponentialMovingAverage / exponentialTimeDecayedSum: decay to latest point") {
    // halflife 2 over (1@0, 2@2, 3@4): weights 0.25, 0.5, 1
    val r = spark.sql(
      """SELECT exponentialMovingAverage(2)(v, t) AS ema,
                exponentialTimeDecayedSum(2)(v, t) AS etds
         FROM VALUES (1.0, 0.0), (2.0, 2.0), (3.0, 4.0) x(v, t)""").head()
    assert(math.abs(r.getDouble(0) - 4.25 / 1.75) < 1e-12)
    val expected = 1.0 * math.exp(-2.0) + 2.0 * math.exp(-1.0) + 3.0
    assert(math.abs(r.getDouble(1) - expected) < 1e-12)
    // huge raw time axis must not overflow the weights (rescaled buffer)
    val big = spark.sql(
      """SELECT exponentialMovingAverage(3600)(v, t) AS ema
         FROM VALUES (5.0, 1.7e9), (7.0, 1.7e9 + 3600) x(v, t)""").head()
    assert(math.abs(big.getDouble(0) - (5.0 * 0.5 + 7.0) / 1.5) < 1e-9)
  }

  test("quantileInterpolatedWeighted: percentile_cont over the weight-expanded multiset") {
    // (1,w1) (2,w2) (4,w1) expands to [1,2,2,4]
    val r = spark.sql(
      """SELECT quantileInterpolatedWeighted(0.5)(v, w) AS med,
                quantileInterpolatedWeighted(0.75)(v, w) AS p75
         FROM VALUES (1.0, 1), (2.0, 2), (4.0, 1) t(v, w)""").head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 2.5) // h = 2.25 between expanded idx 2 (=2) and 3 (=4)
    // weight ≡ 1 degenerates to percentile_cont
    val u = spark.sql(
      "SELECT quantileInterpolatedWeighted(0.3)(v, 1) AS q FROM VALUES (1.0), (2.0), (3.0), (4.0), (5.0) t(v)").head()
    assert(math.abs(u.getDouble(0) - 2.2) < 1e-12)
  }

  test("quantileGK: bounded-rank-error sketch lands near the true median") {
    val med = spark.sql(
      "SELECT quantileGK(100)(id + 1) AS m, quantileGK(100, 0.9)(id + 1) AS p90 FROM range(100)").head()
    assert(med.getLong(0) >= 45L && med.getLong(0) <= 55L)
    assert(med.getLong(1) >= 85L && med.getLong(1) <= 95L)
  }

  test("quantileBFloat16 / toBFloat16: bit-exact upper-16 truncation") {
    val r = spark.sql(
      """SELECT toBFloat16(CAST(3.14159 AS FLOAT)) AS pi_t,
                quantileBFloat16(0.5)(v) AS q
         FROM VALUES (CAST(1.7 AS FLOAT)) t(v)""").head()
    assert(r.getFloat(0) == 3.140625f) // 0x40490FD0 -> 0x40490000
    assert(r.getDouble(1) == 1.6953125) // 0x3FD9999A -> 0x3FD90000
  }

  test("arrayPartialSort / arrayPartialReverseSort: conforming full sorts") {
    val r = spark.sql(
      """SELECT arrayPartialSort(2, array(3, 1, 2)) AS a,
                arrayPartialReverseSort(2, array(3, 1, 2)) AS d""").head()
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getSeq[Int](1) == Seq(3, 2, 1))
  }

  test("arrayShuffle: seeded deterministic permutation; arrayRandomSample subset") {
    val df = spark.sql(
      """SELECT arrayShuffle(array(1, 2, 3, 4, 5, 6, 7, 8), 7) AS s7,
                arrayShuffle(array(1, 2, 3, 4, 5, 6, 7, 8), 7) AS s7b,
                arrayShuffle(array(1, 2, 3, 4, 5, 6, 7, 8), 8) AS s8,
                arrayShuffle(array(), 1) AS se,
                arrayShuffle(array(9), 1) AS s1,
                arrayRandomSample(array(1, 2, 3, 4, 5, 6, 7, 8), 3) AS smp""")
    val r = df.head()
    val s7 = r.getSeq[Int](0)
    assert(s7 == r.getSeq[Int](1))                  // same seed → same permutation
    assert(s7.sorted == Seq(1, 2, 3, 4, 5, 6, 7, 8)) // a permutation, nothing lost
    assert(s7 != r.getSeq[Int](2))                  // different seed → different order
    assert(r.getSeq[Int](3).isEmpty && r.getSeq[Int](4) == Seq(9))
    val smp = r.getSeq[Int](5)
    assert(smp.length == 3 && smp.toSet.subsetOf(Set(1, 2, 3, 4, 5, 6, 7, 8)))
    assert(smp.toSet.size == 3)                     // sample without replacement
  }

  test("groupArrayIntersect: shrinking generic intersection, sorted output") {
    val r = spark.sql(
      """SELECT groupArrayIntersect(a) AS x FROM VALUES
         (array(3, 2, 1)), (array(2, 3, 9)), (array(5, 3, 2)) t(a)""").head()
    assert(r.getSeq[Int](0) == Seq(2, 3))
    val strs = spark.sql(
      """SELECT groupArrayIntersect(a) AS x FROM VALUES
         (array('b', 'a')), (array('a', 'c')) t(a)""").head()
    assert(strs.getSeq[String](0) == Seq("a"))
    val disjoint = spark.sql(
      "SELECT groupArrayIntersect(a) AS x FROM VALUES (array(1)), (array(2)) t(a)").head()
    assert(disjoint.getSeq[Int](0).isEmpty)
  }

  test("nonNegativeDerivative: lag-based rate, clamped, first row and zero step → 0") {
    spark.sql("CREATE OR REPLACE TEMP VIEW nnd_t AS SELECT * FROM VALUES " +
      "(1, 0.0, 10.0), (1, 2.0, 14.0), (1, 4.0, 8.0), (1, 4.0, 9.0), (2, 0.0, 1.0), (2, 10.0, 21.0) v(g, t, m)")
    val rows = spark.sql(
      """SELECT g, t, m,
                nonNegativeDerivative(m, t) OVER (PARTITION BY g ORDER BY t, m) AS d
         FROM nnd_t ORDER BY g, t, m""").collect()
    val d = rows.map(_.getDouble(3))
    assert(d(0) == 0.0)               // first row of partition
    assert(d(1) == 2.0)               // (14-10)/2
    assert(d(2) == 0.0)               // negative derivative clamps
    assert(d(3) == 0.0)               // zero time step → 0, not an error
    assert(d(4) == 0.0 && d(5) == 2.0)
    // INTERVAL scaling: per-minute rate
    val scaled = spark.sql(
      """SELECT nonNegativeDerivative(m, t, INTERVAL 1 MINUTE) OVER (ORDER BY t) AS d
         FROM VALUES (0.0, 0.0), (30.0, 5.0) v(t, m) ORDER BY d""").collect()
    assert(scaled.map(_.getDouble(0)).toSeq == Seq(0.0, 10.0)) // 5/30*60
  }

  test("block-order functions are refused loudly with window guidance") {
    spark.sql("CREATE OR REPLACE TEMP VIEW bo_t AS SELECT * FROM VALUES (1) v(x)")
    for ((fn, hint) <- Seq(
        ("runningDifference(x)", "lagInFrame"),
        ("runningAccumulate(x)", "ROWS UNBOUNDED PRECEDING"),
        ("neighbor(x, 1)", "leadInFrame"))) {
      val e = intercept[Exception](spark.sql(s"SELECT $fn FROM bo_t").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(hint)), s"$fn error should mention $hint")
    }
  }

  test("sequenceNextNode: forward head/first_match, backward tail, null off-end") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW snn_t AS SELECT ts, ev FROM VALUES
      (TIMESTAMP '2024-01-01 00:00:01', 'home'),
      (TIMESTAMP '2024-01-01 00:00:02', 'view'),
      (TIMESTAMP '2024-01-01 00:00:03', 'click'),
      (TIMESTAMP '2024-01-01 00:00:04', 'buy'),
      (TIMESTAMP '2024-01-01 00:00:05', 'exit') v(ts, ev)""")
    val r = spark.sql(
      """SELECT sequenceNextNode('forward', 'first_match')(ts, ev, true, ev = 'view', ev = 'click') AS fm,
                sequenceNextNode('forward', 'head')(ts, ev, true, ev = 'home') AS hd,
                sequenceNextNode('forward', 'head')(ts, ev, true, ev = 'view') AS hd_miss,
                sequenceNextNode('backward', 'tail')(ts, ev, true, ev = 'exit') AS tl,
                sequenceNextNode('forward', 'first_match')(ts, ev, true, ev = 'exit') AS off_end
         FROM snn_t""").head()
    assert(r.getString(0) == "buy")   // view→click chain, next = buy
    assert(r.getString(1) == "view")  // head starts at first event
    assert(r.isNullAt(2))             // head chain must start AT the first event
    assert(r.getString(3) == "buy")   // backward from tail: exit, previous = buy
    assert(r.isNullAt(4))             // chain matches but nothing follows
    // unsupported mode refused loudly
    val e = intercept[Exception](spark.sql(
      "SELECT sequenceNextNode('sideways', 'head')(ts, ev, true, ev = 'x') FROM snn_t").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("forward")))
  }

  test("sparkbar: leveled unicode bars, empty buckets as spaces") {
    val r = spark.sql(
      """SELECT sparkbar(4)(x, y) AS bar FROM VALUES
         (0.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 4.0) t(x, y)""").head()
    assert(r.getString(0) == "▂▄▆█")
    val gap = spark.sql(
      "SELECT sparkbar(3)(x, y) AS bar FROM VALUES (0.0, 2.0), (3.0, 2.0) t(x, y)").head()
    assert(gap.getString(0) == "█ █")
  }

  test("largestTriangleThreeBuckets: endpoints kept, peak survives") {
    val r = spark.sql(
      """SELECT largestTriangleThreeBuckets(3)(x, y) AS pts FROM VALUES
         (0.0, 0.0), (1.0, 10.0), (2.0, 0.0), (3.0, 5.0), (4.0, 0.0) t(x, y)""").head()
    val pts = r.getSeq[org.apache.spark.sql.Row](0).map(p => (p.getDouble(0), p.getDouble(1)))
    assert(pts == Seq((0.0, 0.0), (1.0, 10.0), (4.0, 0.0))) // the spike wins the middle bucket
    // n >= series length → identity
    val id = spark.sql(
      "SELECT largestTriangleThreeBuckets(10)(x, y) AS pts FROM VALUES (0.0, 1.0), (1.0, 2.0) t(x, y)").head()
    assert(id.getSeq[org.apache.spark.sql.Row](0).size == 2)
  }

  test("exponentialTimeDecayed Avg/Count/Max siblings") {
    val r = spark.sql(
      """SELECT exponentialTimeDecayedAvg(2)(v, t) AS ea,
                exponentialTimeDecayedCount(2)(t) AS ec,
                exponentialTimeDecayedMax(2)(v, t) AS em
         FROM VALUES (1.0, 0.0), (2.0, 2.0), (3.0, 4.0) x(v, t)""").head()
    val w = Seq(math.exp(-2.0), math.exp(-1.0), 1.0)
    val num = 1.0 * w(0) + 2.0 * w(1) + 3.0 * w(2)
    val den = w.sum
    assert(math.abs(r.getDouble(0) - num / den) < 1e-12)
    assert(math.abs(r.getDouble(1) - den) < 1e-12)
    assert(r.getDouble(2) == 3.0)
    // max with a decaying earlier spike: 5@0 vs 1@2, tau 2 → 5/e wins
    val spike = spark.sql(
      "SELECT exponentialTimeDecayedMax(2)(v, t) AS em FROM VALUES (5.0, 0.0), (1.0, 2.0) x(v, t)").head()
    assert(math.abs(spike.getDouble(0) - 5.0 * math.exp(-1.0)) < 1e-12)
  }

  test("proportionsZTest, flatten, arrayEnumerateDense, geoDistance, mapConcat") {
    val r = spark.sql(
      """SELECT proportionsZTest(10, 10, 100, 200) AS z,
                flatten(array(array(1, 2), array(3))) AS fl,
                arrayEnumerateDense(array(10, 20, 10, 30)) AS dense,
                geoDistance(0.0, 0.0, 0.0, 1.0) AS gd,
                greatCircleDistance(0.0, 0.0, 0.0, 1.0) AS gc,
                mapConcat(map(1, 'a'), map(2, 'b')) AS mc""").head()
    val p = 20.0 / 300.0
    val expectedZ = (0.1 - 0.05) / math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 200))
    assert(math.abs(r.getDouble(0) - expectedZ) < 1e-12)
    assert(r.getSeq[Int](1) == Seq(1, 2, 3))
    assert(r.getSeq[Long](2) == Seq(1L, 2L, 1L, 3L))
    assert(r.getDouble(3) == r.getDouble(4)) // alias: spherical approximation
    assert(math.abs(r.getDouble(3) - 111194.9) < 100) // ~111 km per degree
    assert(r.getMap[Int, String](5).size == 2)
  }

  test("new aggregates are partition-merge independent") {
    // the same aggregation over 1 vs 13 partitions must be identical —
    // this is what certifies every merge() path (union/intersect/xor
    // set folds, decay re-anchoring, ANOVA summation, chain buffers)
    import spark.implicits._
    val n = 500
    val rows = (0 until n).map { i =>
      (i % 7, (i * 37) % 101, (i % 13).toDouble, i.toDouble % 251)
    }
    val agg =
      """SELECT g,
                groupBitmap(x) AS bc,
                groupBitmapXorState(array(CAST(x AS BIGINT), CAST(x % 9 AS BIGINT))) AS xs,
                groupArrayIntersect(array(x % 5, x % 3, 1)) AS ai,
                round(analysisOfVariance(v, x % 4), 9) AS f,
                round(exponentialMovingAverage(50)(v, t), 9) AS ema,
                round(exponentialTimeDecayedMax(50)(v, t), 9) AS emx,
                quantileInterpolatedWeighted(0.62)(v, x % 6 + 1) AS iw
         FROM src GROUP BY g ORDER BY g"""
    def run(parts: Int): Seq[String] = {
      rows.toDF("g", "x", "v", "t").repartition(parts).createOrReplaceTempView("src")
      spark.sql(agg).collect().map(_.toString).toSeq
    }
    assert(run(1) == run(13))
  }

  test("sequenceMatchEvents: leftmost match timestamps, only (?N) steps") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW sme_t AS SELECT ts, ev FROM VALUES
      (TIMESTAMP '2024-01-01 00:00:01', 'a'),
      (TIMESTAMP '2024-01-01 00:00:02', 'b'),
      (TIMESTAMP '2024-01-01 00:00:03', 'a'),
      (TIMESTAMP '2024-01-01 00:00:04', 'c') v(ts, ev)""")
    val r = spark.sql(
      """SELECT sequenceMatchEvents('(?1).*(?2)')(ts, ev = 'a', ev = 'c') AS m,
                sequenceMatchEvents('(?1).(?2)')(ts, ev = 'b', ev = 'c') AS adj,
                sequenceMatchEvents('(?1).*(?2)')(ts, ev = 'c', ev = 'a') AS none
         FROM sme_t""").head()
    val m = r.getSeq[java.sql.Timestamp](0).map(_.toInstant.getEpochSecond % 60)
    assert(m == Seq(1L, 4L))          // leftmost 'a' (00:01), then 'c'
    val adj = r.getSeq[java.sql.Timestamp](1).map(_.toInstant.getEpochSecond % 60)
    assert(adj == Seq(2L, 4L))        // b, one any-event, c
    assert(r.getSeq[java.sql.Timestamp](2).isEmpty)
  }

  test("toStartOfInterval: µs-axis pmod buckets and month-granular dates") {
    val r = spark.sql(
      """SELECT toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', INTERVAL 15 MINUTE) AS m15,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', INTERVAL 2 HOUR) AS h2,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', INTERVAL 1 DAY) AS d1,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', INTERVAL 2 MONTH) AS mo2,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', INTERVAL 1 YEAR) AS y1""").head()
    assert(r.getTimestamp(0).toString == "2024-03-15 10:45:00.0")
    assert(r.getTimestamp(1).toString == "2024-03-15 10:00:00.0")
    assert(r.getTimestamp(2).toString == "2024-03-15 00:00:00.0")
    assert(r.getDate(3).toString == "2024-03-01")
    assert(r.getDate(4).toString == "2024-01-01")
  }

  test("alphaTokens, normalizeQuery, truncate, bitTestAll/Any, untuple") {
    val r = spark.sql(
      """SELECT alphaTokens('abc1def-gh') AS toks,
                normalizeQuery('SELECT a FROM t WHERE x = 42 AND s = ''v''') AS nq,
                truncate(-1.999, 2) AS tn, truncate(23.7) AS t0,
                bitTestAll(43, 0, 1, 3, 5) AS ball,
                bitTestAll(41, 0, 1, 3, 5) AS ball2,
                bitTestAny(4, 0, 1, 2) AS bany,
                bitTestAny(8, 0, 1, 2) AS bany2""").head()
    assert(r.getSeq[String](0) == Seq("abc", "def", "gh"))
    assert(r.getString(1) == "SELECT a FROM t WHERE x = ? AND s = ?")
    assert(r.getDouble(2) == -1.99 && r.getDouble(3) == 23.0)
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getBoolean(6) && !r.getBoolean(7))
    val ut = spark.sql(
      "SELECT untuple(s) FROM (SELECT tuple(1, 'x') AS s)").head()
    assert(ut.getInt(0) == 1 && ut.getString(1) == "x")
  }

  test("normalQuantile and minSampleSize planners") {
    val r = spark.sql(
      """SELECT normalQuantile(0.975) AS z975,
                normalQuantile(0.5) AS z50,
                normalQuantile(0.8) AS z80,
                minSampleSizeConversion(0.1, 0.02, 0.8, 0.05) AS n_conv,
                minSampleSizeContinuous(100.0, 20.0, 0.05, 0.8, 0.05) AS n_cont""").head()
    assert(math.abs(r.getDouble(0) - 1.959963985) < 1e-7)
    assert(math.abs(r.getDouble(1)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 0.8416212336) < 1e-7)
    // textbook two-proportion size: p1=.1 p2=.12 → ≈ 3841
    assert(math.abs(r.getDouble(3) - 3841.0) < 2.0)
    // continuous: 2·400·(1.95996+0.84162)²/25 = 32·7.849 ≈ 251.1
    val z = 1.959963985 + 0.8416212336
    assert(math.abs(r.getDouble(4) - 2 * 400 * z * z / 25.0) < 0.01)
  }

  test("argMaxIf/argMinIf, groupArrayLast/Sample, matrices, mapSort, aliases") {
    spark.sql("CREATE OR REPLACE TEMP VIEW agg7_t AS SELECT * FROM VALUES " +
      "(1, 10, true), (2, 20, true), (3, 30, false), (4, 5, true) v(id, x, c)")
    val r = spark.sql(
      """SELECT argMaxIf(id, x, c) AS amx, argMinIf(id, x, c) AS amn,
                groupArrayLast(2)(x) AS last2,
                groupArraySample(2, 7)(x) AS smp,
                quantileExactInclusive(0.5)(x) AS med,
                corrMatrix(id, x) AS cm,
                covarPopMatrix(id, x) AS cvm
         FROM agg7_t""").head()
    assert(r.getInt(0) == 2)  // condition excludes x=30
    assert(r.getInt(1) == 4)  // smallest conditioned x is 5 → id 4
    assert(r.getSeq[Int](2) == Seq(20, 30)) // largest two, ascending
    val smp = r.getSeq[Int](3)
    assert(smp.length == 2 && smp.toSet.subsetOf(Set(5, 10, 20, 30)))
    assert(r.getDouble(4) == 15.0) // percentile_cont of [5,10,20,30]
    val cm = r.getSeq[Seq[Double]](5)
    assert(cm.size == 2 && math.abs(cm(0)(0) - 1.0) < 1e-12 && cm(0)(1) == cm(1)(0))
    val cvm = r.getSeq[Seq[Double]](6)
    assert(math.abs(cvm(0)(0) - 1.25) < 1e-12) // varPop of 1..4
    val m = spark.sql(
      """SELECT map_keys(mapSort(map(3, 'c', 1, 'a', 2, 'b'))) AS ks,
                map_keys(mapReverseSort(map(3, 'c', 1, 'a', 2, 'b'))) AS rks,
                arrayDotProduct(array(1.0, 2.0), array(3.0, 4.0)) AS dp,
                identity(42) AS id42""").head()
    assert(m.getSeq[Int](0) == Seq(1, 2, 3) && m.getSeq[Int](1) == Seq(3, 2, 1))
    assert(m.getDouble(2) == 11.0 && m.getInt(3) == 42)
  }

  test("date/time long tail: toTime, MJD, snowflake, ISO year start, makeDate, millis, intervals") {
    val r = spark.sql(
      """SELECT toTime(TIMESTAMP '2024-03-15 10:47:30') AS tt,
                toModifiedJulianDay(DATE '1858-11-17') AS mjd0,
                toModifiedJulianDay(DATE '2024-01-01') AS mjd,
                fromModifiedJulianDay(60310) AS mjd_rt,
                toDaysSinceYearZero(DATE '1970-01-01') AS dy0,
                fromDaysSinceYearZero(719528) AS dy_rt,
                snowflakeToDateTime(1537228928000000000) AS sf,
                toStartOfISOYear(DATE '2021-01-01') AS iso21,
                toStartOfISOYear(DATE '2023-06-15') AS iso23,
                makeDate(2024, 3, 15) AS md3,
                makeDate(2024, 75) AS md2,
                makeDateTime(2024, 3, 15, 10, 47, 30) AS mdt,
                addMilliseconds(TIMESTAMP '2024-01-01 00:00:00', 1500) AS ms,
                addMicroseconds(TIMESTAMP '2024-01-01 00:00:00', 250) AS us,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', toIntervalMinute(15)) AS ivq,
                toStartOfInterval(TIMESTAMP '2024-03-15 10:47:30', toIntervalQuarter(1)) AS ivm""").head()
    assert(r.getTimestamp(0).toString == "1970-01-02 10:47:30.0")
    assert(r.getLong(1) == 0L && r.getLong(2) == 60310L)
    assert(r.getDate(3).toString == "2024-01-01")
    assert(r.getLong(4) == 719528L && r.getDate(5).toString == "1970-01-01")
    // (id >> 22) ms + Twitter epoch 1288834974657 ms
    assert(r.getTimestamp(6).toString == "2022-06-16 00:21:51.424")
    // 2021-01-01 (Fri) sits in ISO 2020-W53; ISO-2020 began Mon 2019-12-30
    assert(r.getDate(7).toString == "2019-12-30")
    assert(r.getDate(8).toString == "2023-01-02")
    assert(r.getDate(9).toString == "2024-03-15" && r.getDate(10).toString == "2024-03-15")
    assert(r.getTimestamp(11).toString == "2024-03-15 10:47:30.0")
    assert(r.getTimestamp(12).toString == "2024-01-01 00:00:01.5")
    assert(r.getTimestamp(13).toString == "2024-01-01 00:00:00.00025")
    assert(r.getTimestamp(14).toString == "2024-03-15 10:45:00.0")
    assert(r.getDate(15).toString == "2024-01-01")
  }

  test("hash spellings, string helpers, XML/HTML, UTF-8 validation") {
    val r = spark.sql(
      """SELECT intHash32(7) AS h32, murmurHash3_32('abc') AS m32,
                ascii('A') AS asc, repeat('ab', 3) AS rep, space(2) AS sp,
                substringIndex('a.b.c', '.', 2) AS si,
                appendTrailingCharIfAbsent('dir', '/') AS app1,
                appendTrailingCharIfAbsent('dir/', '/') AS app2,
                firstLine('one\ntwo') AS fl,
                encodeXMLComponent('a<b&"c"') AS xe,
                decodeXMLComponent('a&lt;b&amp;&quot;c&quot;') AS xd,
                extractTextFromHTML('<html><script>x=1</script><p>Hello  <b>world</b></p></html>') AS txt,
                isValidUTF8('plain') AS ok,
                toValidUTF8('plain') AS tv,
                startsWithUTF8('héllo', 'hé') AS sw""").head()
    assert(r.getLong(0) >= 0 && r.getLong(0) <= 0xFFFFFFFFL)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= 0xFFFFFFFFL)
    assert(r.getInt(2) == 65 && r.getString(3) == "ababab" && r.getString(4) == "  ")
    assert(r.getString(5) == "a.b")
    assert(r.getString(6) == "dir/" && r.getString(7) == "dir/")
    assert(r.getString(8) == "one")
    assert(r.getString(9) == "a&lt;b&amp;&quot;c&quot;")
    assert(r.getString(10) == "a<b&\"c\"")
    assert(r.getString(11) == "Hello world")
    assert(r.getBoolean(12) && r.getString(13) == "plain" && r.getBoolean(14))
  }

  test("IP validation/CIDR, bitmask decompositions, gcd/lcm, simpleJSON, byteSwap") {
    val r = spark.sql(
      """SELECT isIPv4String('10.0.0.1') AS v4ok, isIPv4String('10.0.0.999') AS v4bad,
                isIPv4String('not-an-ip') AS v4no,
                isIPv6String('2001:db8::1') AS v6ok, isIPv6String('10.0.0.1') AS v6no,
                ipv4CIDRToRange('192.168.5.77', 24) AS rng,
                isIPAddressInRange('192.168.5.77', '192.168.5.0/24') AS inr,
                isIPAddressInRange('192.168.6.1', '192.168.5.0/24') AS outr,
                bitmaskToArray(50) AS bma,
                bitPositionsToArray(50) AS bpa,
                bitmaskToList(6) AS bml,
                gcd(12, 18) AS g, lcm(4, 6) AS l,
                byteSwap(1) AS bs,
                simpleJSONExtractString('{"a": "x", "n": 5}', 'a') AS sj,
                simpleJSONExtractInt('{"a": "x", "n": 5}', 'n') AS sn,
                visitParamHas('{"a": 1}', 'b') AS vh""").head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    val rng = r.getStruct(5)
    assert(rng.getString(0) == "192.168.5.0" && rng.getString(1) == "192.168.5.255")
    assert(r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getSeq[Long](8) == Seq(2L, 16L, 32L))
    assert(r.getSeq[Long](9) == Seq(1L, 4L, 5L))
    assert(r.getString(10) == "2,4")
    assert(r.getLong(11) == 6L && r.getLong(12) == 12L)
    assert(r.getLong(13) == 72057594037927936L) // 1 byte-swapped to the top byte
    assert(r.getString(14) == "x" && r.getLong(15) == 5L && !r.getBoolean(16))
  }

  test("QUALIFY: DISTINCT head — filter before dedup, windows over pre-dedup rows (round 13)") {
    viewT()
    // windows compute over ALL rows, then QUALIFY filters, then
    // DISTINCT dedups the survivors — the standard evaluation order
    val got = spark.sql(
      """SELECT DISTINCT k FROM qual_t
         QUALIFY row_number() OVER (PARTITION BY k ORDER BY x) <= 2
         ORDER BY k""").collect().map(_.get(0))
    val want = spark.sql(
      """SELECT DISTINCT k FROM (
           SELECT k, row_number() OVER (PARTITION BY k ORDER BY x) AS rn FROM qual_t
         ) WHERE rn <= 2 ORDER BY k""").collect().map(_.get(0))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }
}
