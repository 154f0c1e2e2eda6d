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

  /** DESC boundless-fill model for one group: grid from max down to
    * min by -s, source rows kept, fills defaulting to 0 or carrying
    * the last source value seen in DESCENDING order. */
  private def descModel(src: Seq[(Long, Long)], s: Long,
                        carry: Boolean): Seq[(Long, Long)] = {
    val bySrc = src.toMap
    val grid = (src.map(_._1).max to src.map(_._1).min by -s).toSet
    val axis = (grid ++ src.map(_._1)).toSeq.sortBy(v => -v)
    var last = 0L
    axis.map { v =>
      bySrc.get(v) match {
        case Some(p) => last = p; (v, p)
        case None    => (v, if (carry) last else 0L)
      }
    }
  }

  test("fuzz: DESC boundless fill matches the model across random draws") {
    val rnd = new scala.util.Random(1602)
    for (trial <- 0 until 25) {
      val s = 1L + rnd.nextInt(3)
      val carry = rnd.nextBoolean()
      val grouped = rnd.nextBoolean()
      val cats = if (grouped) Seq("a", "b") else Seq("x")
      val src: Seq[(String, Long, Long)] = cats.flatMap { c =>
        val n = 1 + rnd.nextInt(6)
        rnd.shuffle((-5 to 20).toList).take(n)
          .map(v => (c, v.toLong, 1L + rnd.nextInt(99)))
      }
      src.toDF("cat", "n", "v").createOrReplaceTempView("fuzz_desc")
      val interp = if (carry) " INTERPOLATE (v AS v)" else ""
      val got =
        if (grouped)
          spark.sql(s"SELECT cat, n, v FROM fuzz_desc ORDER BY cat, n DESC WITH FILL STEP -$s$interp")
            .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        else
          spark.sql(s"SELECT n, v FROM fuzz_desc ORDER BY n DESC WITH FILL STEP -$s$interp")
            .collect().map(r => ("x", r.getLong(0), r.getLong(1))).toSeq
      val want = cats.flatMap { c =>
        descModel(src.filter(_._1 == c).map(t => (t._2, t._3)), s, carry)
          .map { case (n, v) => (c, n, v) }
      }
      assert(got == want,
        s"trial $trial (s=$s carry=$carry grouped=$grouped)\nsrc  $src\ngot  $got\nwant $want")
    }
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
