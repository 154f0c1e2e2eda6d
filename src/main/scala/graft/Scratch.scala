package graft

/** Round-17 scratch main (deleted before round end): exercise the new
  * fill forms.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scratch")
    import spark.implicits._

    // CH docs example translated to ints: numbers(10) where n%3=1 →
    // n ∈ {1,4,7}; k1 = n (fills 1..7), k2 = n*10
    Seq(1, 4, 7).map(n => (n, n * 10, "original")).toDF("a", "b", "src")
      .createOrReplaceTempView("mk_t")
    println("=== multikey: ORDER BY a WITH FILL, b WITH FILL ===")
    spark.sql("SELECT a, b, src FROM mk_t ORDER BY a WITH FILL, b WITH FILL").show(50, false)

    // grouped second key fill: repeated a values
    Seq((1, 1, 10.0), (1, 4, 40.0), (3, 2, 20.0), (3, 3, 30.0))
      .toDF("a", "b", "v").createOrReplaceTempView("mk2_t")
    println("=== multikey with repeats: a WITH FILL, b WITH FILL ===")
    spark.sql("SELECT a, b, v FROM mk2_t ORDER BY a WITH FILL, b WITH FILL").show(50, false)

    println("=== multikey + INTERPOLATE (v) ===")
    spark.sql("SELECT a, b, v FROM mk2_t ORDER BY a WITH FILL, b WITH FILL INTERPOLATE (v)").show(50, false)

    // non-affine: geometric and cross-column
    Seq((1, 100.0, 5.0), (5, 200.0, 7.0)).toDF("t", "c", "w").createOrReplaceTempView("na_t")
    println("=== INTERPOLATE (c AS c * 2, w AS w + t) ===")
    spark.sql("SELECT t, c, w FROM na_t ORDER BY t WITH FILL INTERPOLATE (c AS c * 2, w AS w + t)").show(50, false)

    // staleness on a date axis
    Seq(("2024-01-02", 1.0), ("2024-01-03", 2.0), ("2024-01-10", 3.0), ("2024-01-12", 4.0))
      .toDF("ds", "v").selectExpr("CAST(ds AS DATE) AS d", "v")
      .createOrReplaceTempView("st_t")
    println("=== date STALENESS: STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY ===")
    spark.sql("SELECT d, v FROM st_t ORDER BY d WITH FILL STEP INTERVAL 1 DAY STALENESS INTERVAL 3 DAY").show(50, false)

    spark.stop()
  }
}
