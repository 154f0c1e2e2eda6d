package graft

/** Round 16: ANSI OFFSET/FETCH pagination — the standard spelling CH
  * accepts alongside LIMIT/OFFSET. Pins the ROW/ROWS noise-word strip,
  * FETCH FIRST/NEXT lowering to LIMIT, the omitted-count = 1-row
  * default, WITH TIES riding the q29k rank() wrap, and the loud
  * refusal of OFFSET combined with WITH TIES. */
class Round16OffsetFetchSpec extends SparkSpec {
  import spark.implicits._

  private def mkView(): Unit =
    (1 to 20).map(i => (i.toLong, s"r$i")).toDF("n", "tag")
      .createOrReplaceTempView("page_src")

  test("OFFSET n ROWS FETCH NEXT m ROWS ONLY pages deterministically") {
    mkView()
    val rows = spark.sql(
      """SELECT n, tag FROM page_src ORDER BY n
        |OFFSET 5 ROWS FETCH NEXT 3 ROWS ONLY""".stripMargin)
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(6L, 7L, 8L))
    // FIRST spelling and the singular ROW noise word
    val first = spark.sql(
      """SELECT n FROM page_src ORDER BY n
        |OFFSET 1 ROW FETCH FIRST 2 ROWS ONLY""".stripMargin)
      .collect().map(_.getLong(0))
    assert(first.toSeq == Seq(2L, 3L))
  }

  test("FETCH FIRST without OFFSET, and the omitted count defaults to 1 row") {
    mkView()
    val three = spark.sql("SELECT n FROM page_src ORDER BY n FETCH FIRST 3 ROWS ONLY")
      .collect().map(_.getLong(0))
    assert(three.toSeq == Seq(1L, 2L, 3L))
    val one = spark.sql("SELECT n FROM page_src ORDER BY n FETCH FIRST ROW ONLY")
      .collect().map(_.getLong(0))
    assert(one.toSeq == Seq(1L))
    // bare OFFSET n ROWS with no FETCH
    val tail = spark.sql("SELECT n FROM page_src ORDER BY n OFFSET 18 ROWS")
      .collect().map(_.getLong(0))
    assert(tail.toSeq == Seq(19L, 20L))
  }

  test("FETCH ... WITH TIES keeps rows tying with the last fetched sort key") {
    Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, "d")).toDF("k", "tag")
      .createOrReplaceTempView("ties_src")
    val rows = spark.sql(
      "SELECT k FROM ties_src ORDER BY k FETCH FIRST 2 ROWS WITH TIES")
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L, 2L, 2L))
  }

  test("OFFSET combined with WITH TIES stays untouched and fails loudly") {
    mkView()
    intercept[Exception](spark.sql(
      """SELECT n FROM page_src ORDER BY n
        |OFFSET 2 ROWS FETCH FIRST 3 ROWS WITH TIES""".stripMargin).collect())
  }
}
