package graft

/** Property fuzz for the WITH FILL INTERPOLATE AS machinery (round
  * 15): random source rows (including off-grid and pre-FROM ones),
  * random affine steps, carry and plain columns side by side — the
  * three-level window SQL (group trick + last_value + row_number)
  * must equal a straightforward fold over the output rows in fill
  * order: source rows keep their value; filled rows step from the
  * previous row's value (carry = step 0); rows before the first
  * source get the 0 default, like the bare form. */
class Round15InterpolateFuzzSpec extends SparkSpec {

  test("fuzz: affine INTERPOLATE equals the previous-row fold model") {
    val rnd = new scala.util.Random(1505)
    for (trial <- 0 until 10) {
      val from = rnd.nextInt(5)
      val to = from + 10 + rnd.nextInt(30)
      // random sparse sources, some off-grid on both sides
      val xs = (-3 until to + 6).filter(_ => rnd.nextDouble() < 0.25).distinct.sorted
      if (xs.nonEmpty) {
        val src = xs.map(x => (x, (rnd.nextInt(200) - 100).toLong, rnd.nextInt(50).toLong))
        val k = { val c = rnd.nextInt(13) - 6; if (c == 0) 7 else c }
        val op = if (k >= 0) s"+ $k" else s"- ${-k}"
        spark.createDataFrame(src).toDF("x", "v", "w")
          .createOrReplaceTempView(s"wfi_fz_$trial")
        val got = spark.sql(
          s"""SELECT x, v, w FROM wfi_fz_$trial
              ORDER BY x WITH FILL FROM $from TO $to INTERPOLATE (v AS v $op, w AS w)""")
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        // model: the union of grid points and source xs, in order;
        // fold carrying the previous OUTPUT row's v/w
        val srcBy = src.map(s => s._1 -> s).toMap
        val axis = ((from until to) ++ xs).distinct.sorted
        var prevV = 0L
        var prevW = 0L
        var seenSource = false
        val want = axis.map { x =>
          val row = srcBy.get(x) match {
            case Some((_, v, w)) => seenSource = true; (x, v, w)
            case None => (x, if (seenSource) prevV + k else 0L, if (seenSource) prevW else 0L)
          }
          prevV = row._2; prevW = row._3
          row
        }
        assert(got == want,
          s"trial $trial (from=$from to=$to k=$k xs=$xs):\ngot  $got\nwant $want")
      }
    }
  }
}
