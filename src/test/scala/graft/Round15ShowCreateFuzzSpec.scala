package graft

/** Round-15 round-trip fuzz: `SHOW CREATE TABLE` output must be
  * EXECUTABLE ClickHouse DDL that reproduces the table — the exact
  * thing a migrating user does with it (copy the statement, create
  * the table elsewhere). Random column types, partition/order/TTL/
  * SETTINGS combinations and body-declared projections; the property
  * is the fixpoint SHOW(CREATE(SHOW(t))) == SHOW(t) (modulo the
  * table name) plus schema equality. */
class Round15ShowCreateFuzzSpec extends SparkSpec {

  test("fuzz: SHOW CREATE TABLE output re-executes and reproduces the table") {
    val rnd = new scala.util.Random(1504)
    val scalarTypes = Seq("Int64", "Int32", "Int16", "Float64", "Float32", "String",
      "Bool", "Date", "Decimal(12, 3)", "Array(Int64)", "Map(String, Int64)")
    for (trial <- 0 until 6) {
      val a = s"fz_sct_a_$trial"
      val b = s"fz_sct_b_$trial"
      dropWithLocation(a); dropWithLocation(b)
      // c0 Int64 (order key), c1 String (partition key), c2 Date
      // (TTL base), then random tail columns
      val tail = (0 until rnd.nextInt(4)).map(i =>
        s"c${3 + i} ${scalarTypes(rnd.nextInt(scalarTypes.size))}")
      val cols = Seq("c0 Int64", "c1 String", "c2 Date") ++ tail
      val proj =
        if (rnd.nextBoolean()) Seq("PROJECTION p_fz (SELECT c0, c1 ORDER BY c0)") else Nil
      val partition = if (rnd.nextBoolean()) " PARTITION BY c1" else ""
      val order = if (rnd.nextBoolean()) " ORDER BY (c0, c1)" else " ORDER BY c0"
      val ttl = if (rnd.nextBoolean()) " TTL c2 + INTERVAL 90 DAY" else ""
      val settings = if (rnd.nextBoolean()) " SETTINGS index_granularity = 8192" else ""
      spark.sql(s"CREATE TABLE $a (${(cols ++ proj).mkString(", ")}) " +
        s"ENGINE = MergeTree$partition$order$ttl$settings")
      val shownA = spark.sql(s"SHOW CREATE TABLE $a").head().getString(0)
      // the shown DDL is executable as-is under a new name
      spark.sql(shownA.replace(a, b))
      val shownB = spark.sql(s"SHOW CREATE TABLE $b").head().getString(0)
      assert(shownB == shownA.replace(a, b),
        s"trial $trial: SHOW∘CREATE not a fixpoint\nA: $shownA\nB: $shownB")
      assert(spark.table(b).schema == spark.table(a).schema, s"trial $trial: schema drift")
      // the reproduced table carries the projection declaration too
      if (proj.nonEmpty) assert(shownB.contains("PROJECTION p_fz"),
        s"trial $trial: projection lost in the round trip\n$shownB")
      // and the live TTL rule
      if (ttl.nonEmpty) assert(shownB.contains("TTL c2 + INTERVAL 90 DAY"))
      dropWithLocation(a); dropWithLocation(b)
    }
  }
}
