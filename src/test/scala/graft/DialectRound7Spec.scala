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

  test("QUALIFY: DISTINCT head is refused loudly (no silent key change)") {
    viewT()
    val e = intercept[Exception] {
      spark.sql(
        """SELECT DISTINCT k FROM qual_t
           QUALIFY row_number() OVER (ORDER BY k) = 1""").collect()
    }
    assert(e.getMessage.toUpperCase.contains("QUALIFY")) // parse error names the keyword
  }
}
