package graft

/** Round 16: model-based fuzz for `WITH FILL STALENESS` (the round's
  * new fill form), extending the round-15 INTERPOLATE fuzz
  * convention. A Scala reference model computes CH's semantics from
  * first principles — each source row at v fills v+s, v+2s, … while
  * < min(v+k, next source value); the last row runs to v+k exclusive;
  * fill rows default the payload to 0 (or carry it under
  * INTERPOLATE) — and random (source set, k, s, grouped?, carry?)
  * draws must match the SQL result exactly. Catches off-by-one run
  * bounds, duplicate-run fan-out, per-group restart leaks, and
  * carry-across-group bleed that example-based tests can miss. */
class Round16StalenessFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** CH staleness-fill model over one group's (axis, payload) rows
    * (axis values distinct). Returns (axis, payload) in fill order. */
  private def modelGroup(src: Seq[(Long, Long)], k: Long, s: Long,
                         carry: Boolean): Seq[(Long, Long)] = {
    val sorted = src.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (i <- sorted.indices) {
      val (v, payload) = sorted(i)
      out += ((v, payload))
      val bound = sorted.lift(i + 1).map(_._1) match {
        case Some(next) => math.min(v + k, next)
        case None       => v + k
      }
      var f = v + s
      while (f < bound) {
        out += ((f, if (carry) payload else 0L))
        f += s
      }
    }
    out.toSeq
  }

  test("fuzz: staleness fill matches the first-principles model across random draws") {
    val rnd = new scala.util.Random(1601)
    for (trial <- 0 until 40) {
      val k = 1L + rnd.nextInt(7)
      val s = 1L + rnd.nextInt(3)
      val grouped = rnd.nextBoolean()
      val carry = rnd.nextBoolean()
      val cats = if (grouped) Seq("a", "b") else Seq("x")
      // distinct axis values per category (carry order among equal
      // axis values is undefined; the dup case is example-pinned)
      val src: Seq[(String, Long, Long)] = cats.flatMap { c =>
        val n = 1 + rnd.nextInt(6)
        rnd.shuffle((-5 to 25).toList).take(n)
          .map(v => (c, v.toLong, 1L + rnd.nextInt(99)))
      }
      src.toDF("cat", "n", "v").createOrReplaceTempView("fuzz_stale")
      val interp = if (carry) " INTERPOLATE (v AS v)" else ""
      val sql =
        if (grouped)
          s"SELECT cat, n, v FROM fuzz_stale ORDER BY cat, n WITH FILL STEP $s STALENESS $k$interp"
        else
          s"SELECT n, v FROM fuzz_stale ORDER BY n WITH FILL STEP $s STALENESS $k$interp"
      val got =
        if (grouped)
          spark.sql(sql).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        else
          spark.sql(sql).collect().map(r => ("x", r.getLong(0), r.getLong(1))).toSeq
      val want = cats.flatMap { c =>
        modelGroup(src.filter(_._1 == c).map(t => (t._2, t._3)), k, s, carry)
          .map { case (n, v) => (c, n, v) }
      }.sortBy(t => (t._1, t._2))
      assert(got.sortBy(t => (t._1, t._2)) == want,
        s"trial $trial (k=$k s=$s grouped=$grouped carry=$carry)\n" +
          s"src  ${src.sortBy(t => (t._1, t._2))}\ngot  ${got.sortBy(t => (t._1, t._2))}\nwant $want")
      // the output order itself is the fill order
      assert(got == got.sortBy(t => (t._1, t._2)),
        s"trial $trial: output must arrive ordered by (prefix, axis)")
    }
  }
}
