package graft

import scala.util.Random

/** Model-based fuzz for the round-17 fill forms, following
  * Round16StalenessFuzzSpec's pattern: a tiny sequential reference
  * interpreter in plain Scala (the semantics as DOCUMENTED: fill rows
  * before the first source row take the all-defaults value; from the
  * first source on, each filled row applies the recurrence to the
  * previous output row), compared against the SQL rewrite's output on
  * randomized sparse inputs. Seeds are fixed — failures reproduce.
  */
class Round17FillFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------ non-affine INTERPOLATE

  private def modelInterp(src: Seq[(Int, Double, Double)], op: String, operandIsAxis: Boolean,
                          k: Double): Seq[(Int, Double, Double)] = {
    // src: (t, c, w) with t distinct sorted; fill t over [min, max];
    // interp column is c; w is a passenger (0-default). When
    // operandIsAxis, the cross-column operand is t itself.
    val byT = src.map(r => r._1 -> r).toMap
    val ts = src.map(_._1)
    var out = Vector.empty[(Int, Double, Double)]
    var seenSource = false
    for (t <- ts.min to ts.max) {
      byT.get(t) match {
        case Some(r) => seenSource = true; out :+= r
        case None =>
          val c =
            if (!seenSource) 0.0
            else {
              val (pt, pc, _) = out.last
              op match {
                case "*"    => pc * k
                case "/"    => pc / k
                case "+"    => pc + k
                case "+col" => pc + (if (operandIsAxis) pt.toDouble else 0.0)
                case "-col" => pc - (if (operandIsAxis) pt.toDouble else 0.0)
              }
            }
          out :+= ((t, c, 0.0))
      }
    }
    out
  }

  test("fuzz: geometric / affine / cross-column INTERPOLATE vs the sequential model") {
    val rnd = new Random(1701)
    for (round <- 0 until 24) {
      val n = 2 + rnd.nextInt(8)
      val ts = rnd.shuffle((0 to 40).toList).take(n).sorted
      val src = ts.map(t => (t, math.rint((rnd.nextDouble() * 20 - 10) * 4) / 4,
        math.rint(rnd.nextDouble() * 10 * 4) / 4))
      val (op, expr, opIsAxis, k) = rnd.nextInt(4) match {
        case 0 => ("*", "c AS c * 2", false, 2.0)
        case 1 => ("/", "c AS c / 2", false, 2.0)
        case 2 => ("+col", "c AS c + t", true, 0.0)
        case 3 => ("-col", "c AS c - t", true, 0.0)
      }
      src.toDF("t", "c", "w").createOrReplaceTempView("fz_interp")
      val got = spark.sql(
        s"SELECT t, c, w FROM fz_interp ORDER BY t WITH FILL INTERPOLATE ($expr)")
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
      val want = modelInterp(src, op, opIsAxis, k)
      assert(got.size == want.size, s"round $round op $op: size ${got.size} vs ${want.size}")
      got.zip(want).foreach { case ((gt, gc, gw), (wt, wc, ww)) =>
        assert(gt == wt, s"round $round op $op axis: $gt vs $wt")
        assert(math.abs(gc - wc) <= 1e-9 * math.max(1.0, math.abs(wc)),
          s"round $round op $op at t=$gt: c $gc vs $wc\nsrc=$src")
        assert(gw == ww, s"round $round op $op at t=$gt: w $gw vs $ww")
      }
    }
  }

  // -------------------------------------------------- multi-key fill

  /** N-key nested fill, recursively: key j fills [min,max] within its
    * (keys 0..j-1) group; a missing value inserts one row with all
    * later keys and the value at their defaults — exactly the
    * composition rewriteMultiFill executes and the CH docs shape. */
  private def modelNestedFill(rows: Seq[(List[Int], Double)]): Seq[(List[Int], Double)] = {
    val arity = rows.head._1.length
    val groups = rows.groupBy(_._1.head)
    val ks = groups.keySet
    (ks.min to ks.max).toSeq.flatMap { k =>
      groups.get(k) match {
        case Some(g) =>
          if (arity == 1) Seq((List(k), g.head._2))
          else modelNestedFill(g.map { case (l, v) => (l.tail, v) })
            .map { case (l, v) => (k :: l, v) }
        case None => Seq((k :: List.fill(arity - 1)(0), 0.0))
      }
    }
  }

  test("fuzz: 2- and 3-key nested fill vs the recursive model") {
    val rnd = new Random(2026)
    for (round <- 0 until 24) {
      val arity = 2 + rnd.nextInt(2)
      val n = 2 + rnd.nextInt(7)
      val src0 = (0 until n).map { _ =>
        (List.fill(arity)(rnd.nextInt(6)), math.rint(rnd.nextDouble() * 40) / 4)
      }
      // distinct full key-vectors (duplicate keys would be a GROUP BY
      // upstream in any real query)
      val src = src0.groupBy(_._1).map(_._2.head).toSeq
      val cols = Seq("a", "b", "c").take(arity)
      val df =
        if (arity == 2) src.map { case (l, v) => (l(0), l(1), v) }.toDF("a", "b", "v")
        else src.map { case (l, v) => (l(0), l(1), l(2), v) }.toDF("a", "b", "c", "v")
      df.createOrReplaceTempView("fz_mk")
      val fills = cols.map(c => s"$c WITH FILL").mkString(", ")
      val got = spark.sql(s"SELECT ${cols.mkString(", ")}, v FROM fz_mk ORDER BY $fills")
        .collect().map(r => (List.range(0, arity).map(r.getInt), r.getDouble(arity))).toSeq
      val want = modelNestedFill(src)
      assert(got == want, s"round $round arity=$arity src=$src\ngot=$got\nwant=$want")
    }
  }

  // ------------------------------------------- STALENESS on date axes

  private def modelDateStaleness(src: Seq[(Int, Double)], k: Int): Seq[(Int, Double)] = {
    // src: (dayOffset, v) sorted by day; each source day d spawns
    // d+1, d+2, … while < min(d+k, next source day)
    val days = src.map(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    src.zipWithIndex.foreach { case ((d, v), i) =>
      out += ((d, v))
      val cap = math.min(d + k, if (i + 1 < days.size) days(i + 1) else d + k)
      ((d + 1) until cap).foreach(f => out += ((f, 0.0)))
    }
    out.toSeq.sortBy(_._1)
  }

  test("fuzz: date-axis STALENESS INTERVAL vs the bounded-runs model") {
    val rnd = new Random(4242)
    val base = java.time.LocalDate.parse("2024-03-01")
    for (round <- 0 until 24) {
      val n = 1 + rnd.nextInt(7)
      val days = rnd.shuffle((0 to 30).toList).take(n).sorted
      val k = 2 + rnd.nextInt(4)
      val src = days.map(d => (d, math.rint(rnd.nextDouble() * 40) / 4))
      src.map { case (d, v) => (base.plusDays(d).toString, v) }
        .toDF("ds", "v").selectExpr("CAST(ds AS DATE) AS d", "v")
        .createOrReplaceTempView("fz_stale")
      val got = spark.sql(
        s"""SELECT d, v FROM fz_stale
           |ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL $k DAY""".stripMargin)
        .collect().map(r =>
          (java.time.temporal.ChronoUnit.DAYS.between(base, r.getDate(0).toLocalDate).toInt,
            r.getDouble(1))).toSeq
      assert(got == modelDateStaleness(src, k),
        s"round $round k=$k src=$src\ngot=$got\nwant=${modelDateStaleness(src, k)}")
    }
  }
}
