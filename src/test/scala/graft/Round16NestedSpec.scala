package graft

/** Round 16: the CH `Nested` type and the ALIAS-LESS `ARRAY JOIN`
  * spelling (CH's most common — the element shadows the array
  * column). Nested(a T, b U) lands as ARRAY<STRUCT<a,b>> — one
  * Spark-idiomatic carrier whose `n.a` still answers the per-field
  * array and whose alias-less ARRAY JOIN explodes lockstep rows.
  * Alias-less EXPRESSIONS (CH names outputs after the expression
  * text) keep refusing by pass-through. */
class Round16NestedSpec extends SparkSpec {
  import spark.implicits._

  test("Nested DDL lands as array-of-struct; n.field answers the per-field array") {
    spark.sql("DROP TABLE IF EXISTS nested_t")
    spark.sql(
      """CREATE TABLE nested_t (
        |  id UInt32,
        |  params Nested(key String, value UInt64)
        |) ENGINE = MergeTree ORDER BY id""".stripMargin)
    val f = spark.table("nested_t").schema("params").dataType
    assert(f.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val st = f.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st.fieldNames.toSeq == Seq("key", "value"))
    spark.sql(
      """INSERT INTO nested_t VALUES
        |  (1, array(named_struct('key', 'a', 'value', 10L), named_struct('key', 'b', 'value', 20L))),
        |  (2, array(named_struct('key', 'c', 'value', 30L)))""".stripMargin)
    // CH: params.key without ARRAY JOIN is the Array of keys
    val keys = spark.sql("SELECT id, params.key AS ks FROM nested_t ORDER BY id")
      .collect().map(_.getSeq[String](1).toList)
    assert(keys.toSeq == Seq(List("a", "b"), List("c")))
    // alias-less ARRAY JOIN on the nested group: lockstep scalars
    val rows = spark.sql(
      """SELECT id, params.key AS k, params.value AS v
        |FROM nested_t ARRAY JOIN params ORDER BY id, k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L)))
    spark.sql("DROP TABLE IF EXISTS nested_t")
  }

  test("alias-less ARRAY JOIN shadows the array column with its element") {
    Seq((1L, Seq(10L, 20L), Seq("x", "y")), (2L, Seq(30L), Seq("z")))
      .toDF("id", "vals", "tags").createOrReplaceTempView("aj_bare")
    // single array: the element takes the array's own name
    val single = spark.sql(
      "SELECT id, vals FROM aj_bare ARRAY JOIN vals ORDER BY id, vals")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(single.toSeq == Seq((1L, 10L), (1L, 20L), (2L, 30L)))
    // two arrays zip positionally, both shadowed
    val multi = spark.sql(
      "SELECT id, vals, tags FROM aj_bare ARRAY JOIN vals, tags ORDER BY id, vals")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(multi.toSeq == Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 30L, "z")))
    // mixed: bare shadows, AS adds a new name and keeps the column
    val mixed = spark.sql(
      """SELECT id, vals, t FROM aj_bare ARRAY JOIN vals, tags AS t
        |ORDER BY id, vals""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(mixed.toSeq == Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 30L, "z")))
  }

  test("LEFT ARRAY JOIN alias-less keeps empty-array rows (Spark-NULL convention)") {
    Seq((1L, Seq(10L)), (2L, Seq.empty[Long])).toDF("id", "vals")
      .createOrReplaceTempView("aj_left")
    val rows = spark.sql(
      "SELECT id, vals FROM aj_left LEFT ARRAY JOIN vals ORDER BY id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 10L), (2L, -1L)))
  }

  test("unequal array sizes raise like CH; SELECT * sees no helper columns") {
    Seq((1L, Seq(1L, 2L, 3L), Seq(10L, 20L))).toDF("id", "a", "b")
      .createOrReplaceTempView("aj_sizes")
    // CH raises SIZES_OF_ARRAYS_DONT_MATCH — never a silent NULL pad
    val e = intercept[Exception](spark.sql(
      "SELECT id, a, b FROM aj_sizes ARRAY JOIN a, b").collect())
    assert(e.getMessage != null)
    // star output of the ALIASED spelling carries no gr_aj_pos__
    Seq((1L, Seq(1L, 2L), Seq(10L, 20L))).toDF("id", "a", "b")
      .createOrReplaceTempView("aj_star")
    val cols = spark.sql("SELECT * FROM aj_star ARRAY JOIN a AS x, b AS y").columns.toSeq
    assert(cols == Seq("id", "a", "b", "x", "y"), s"got $cols")
    // LEFT ARRAY JOIN with BOTH arrays NULL passes the null-safe guard
    Seq((1L, Option(Seq(1L)), Option(Seq(10L))),
        (2L, Option.empty[Seq[Long]], Option.empty[Seq[Long]]))
      .toDF("id", "a", "b").createOrReplaceTempView("aj_nulls")
    val rows = spark.sql(
      "SELECT id, a, b FROM aj_nulls LEFT ARRAY JOIN a, b ORDER BY id")
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
    assert(rows.toSeq == Seq((1L, false, false), (2L, true, true)))
  }

  test("alias-less expressions and WHERE-tail queries behave") {
    Seq((1L, Seq(1L, 2L))).toDF("id", "vals").createOrReplaceTempView("aj_expr")
    // an alias-less EXPRESSION refuses by pass-through (loud)
    intercept[Exception](spark.sql(
      "SELECT id FROM aj_expr ARRAY JOIN arrayMap(x -> x + 1, vals)").collect())
    // the clause lookahead still hands WHERE back to the outer query
    val n = spark.sql(
      "SELECT id, vals FROM aj_expr ARRAY JOIN vals WHERE vals > 1")
      .collect().map(_.getLong(1))
    assert(n.toSeq == Seq(2L))
  }
}
