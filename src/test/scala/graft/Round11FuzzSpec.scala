package graft

import org.apache.spark.sql.functions._

/** Randomized cross-checks for the round-11 features: every case
  * compares the engine against an independent Scala reference
  * (seeded — failures reproduce). */
class Round11FuzzSpec extends SparkSpec {
  import spark.implicits._

  test("fuzz: chained PASTE JOIN equals the Scala zip of sorted sides") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 8) {
      val nSides = 2 + rnd.nextInt(3) // 2..4
      val sides = (0 until nSides).map { s =>
        val n = 1 + rnd.nextInt(6)
        val asc = rnd.nextBoolean()
        val vals = Seq.fill(n)(rnd.nextInt(1000)).distinct // distinct → total order
        (vals, asc)
      }
      val sqlSides = sides.zipWithIndex.map { case ((vals, asc), i) =>
        s"(SELECT c$i FROM VALUES ${vals.map(v => s"($v)").mkString(", ")} t(c$i) " +
          s"ORDER BY c$i${if (asc) "" else " DESC"})"
      }
      val got = spark.sql(
        s"SELECT * FROM ${sqlSides.mkString(" PASTE JOIN ")} ORDER BY c0${if (sides.head._2) "" else " DESC"}")
        .collect().map(r => (0 until nSides).map(r.getInt).toSeq).toSeq
      // reference: sort each side by its own order, zip, truncate
      val sorted = sides.map { case (vals, asc) =>
        if (asc) vals.sorted else vals.sorted.reverse
      }
      val len = sorted.map(_.size).min
      val want0 = (0 until len).map(i => sorted.map(_(i)))
      val want = if (sides.head._2) want0.sortBy(_.head) else want0.sortBy(-_.head)
      assert(got == want, s"trial $trial: sides=$sides\n got=$got\nwant=$want")
    }
  }

  test("fuzz: TTL GROUP BY rollup equals the reference per-group algebra") {
    val rnd = new scala.util.Random(4242L)
    for (trial <- 0 until 3) {
      val t = s"ttl_fuzz_$trial"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"${spark.conf.get("spark.sql.warehouse.dir")}/$t"), true)
      spark.sql(s"""CREATE TABLE $t (k String, id UInt64, v Float64, d DateTime)
                    ENGINE = MergeTree ORDER BY (k, id)""")
      val rows = (0 until 30).map { i =>
        val k = s"g${rnd.nextInt(4)}"
        val expired = rnd.nextBoolean()
        (k, i.toLong, (rnd.nextInt(100) + 1).toDouble,
          if (expired) "2020-01-01 00:00:00" else "2123-01-01 00:00:00")
      }
      spark.sql(s"INSERT INTO $t VALUES " + rows.map { case (k, id, v, d) =>
        s"('$k', $id, $v, toDateTime('$d'))"
      }.mkString(", "))
      spark.sql(s"ALTER TABLE $t MODIFY TTL d + INTERVAL 30 DAY GROUP BY k SET v = sum(v)")
      spark.sql(s"ALTER TABLE $t MATERIALIZE TTL")
      val got = spark.table(t).orderBy("k", "id")
        .select("k", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      // reference: live rows verbatim + one row per group of expired
      // rows (id = min, v = sum)
      val (expd, live) = rows.partition(_._4.startsWith("2020"))
      val rolled = expd.groupBy(_._1).map { case (k, g) =>
        (k, g.map(_._2).min, g.map(_._3).sum)
      }
      val want = (live.map(r => (r._1, r._2, r._3)) ++ rolled).sortBy(r => (r._1, r._2))
      assert(got == want, s"trial $trial\n got=$got\nwant=$want")
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("fuzz: lambda arraySort equals Scala sortBy (stable, NULL-free)") {
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 20) {
      val arr = Seq.fill(1 + rnd.nextInt(8))(rnd.nextInt(20) - 10)
      val got = spark.sql(
        s"SELECT arraySort(x -> x * x, array(${arr.mkString(",")})) AS a")
        .head().getSeq[Int](0)
      val want = arr.sortBy(x => x * x)
      // equal keys: any stable order of equal-key elements is the
      // contract; compare keys, and multiset of elements
      assert(got.map(x => x * x) == want.map(x => x * x), s"$arr -> $got")
      assert(got.sorted == arr.sorted)
    }
  }

  test("fuzz: mapApply round-trips entries for random maps") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 0 until 10) {
      val m = Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(100)).distinct
        .map(k => k -> rnd.nextInt(1000)).toMap
      val entries = m.toSeq.map { case (k, v) => s"$k, $v" }.mkString(", ")
      val got = spark.sql(
        s"SELECT mapApply((k, v) -> tuple(k + 1000, v * 3), map($entries)) AS m")
        .head().getMap[Int, Int](0)
      val want = m.map { case (k, v) => (k + 1000) -> (v * 3) }
      assert(got == want, s"$m -> $got")
    }
  }

  test("chained -If combinators equal explicit WHERE pre-filters") {
    spark.range(40)
      .selectExpr("id", "CAST(id % 4 AS INT) AS g", "array(id, id * 2) AS arr",
        "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("cbf_t")
    // every -If form must equal the base aggregate over a WHERE'd scan
    val ifs = spark.sql(
      """SELECT sumArrayIf(arr, g = 1) AS sa,
                groupUniqArrayIf(g, id < 6) AS gu,
                round(stddevPopIf(v, g = 1), 6) AS sp,
                round(varSampIf(v, g = 1), 6) AS vs,
                round(corrIf(v, v % 7, g = 1), 6) AS cr,
                round(covarPopIf(v, v % 7, g = 1), 6) AS cp,
                CAST(sumDistinctIf(g, id < 10) AS BIGINT) AS sd,
                quantilesIf(0.25, 0.75)(v, g = 1) AS qs
         FROM cbf_t""").head()
    val base = spark.sql(
      """SELECT sumArray(arr) AS sa, round(stddevPop(v), 6) AS sp,
                round(varSamp(v), 6) AS vs, round(corr(v, v % 7), 6) AS cr,
                round(covarPop(v, v % 7), 6) AS cp,
                quantiles(0.25, 0.75)(v) AS qs
         FROM cbf_t WHERE g = 1""").head()
    assert(ifs.getAs[Number](0).longValue == base.getAs[Number](0).longValue)
    assert(ifs.getSeq[Int](1).sorted == Seq(0, 1, 2, 3)) // ids 0..5 → all four groups
    assert(ifs.getDouble(2) == base.getDouble(1))
    assert(ifs.getDouble(3) == base.getDouble(2))
    assert(ifs.getDouble(4) == base.getDouble(3))
    assert(ifs.getDouble(5) == base.getDouble(4))
    assert(ifs.getLong(6) == (0 + 1 + 2 + 3)) // distinct groups among ids<10
    assert(ifs.getSeq[Double](7) == base.getSeq[Double](5))
  }

  test("fuzz: %-format translation matches java.time rendering") {
    val ts = java.time.LocalDateTime.of(2024, 3, 7, 13, 4, 5)
    val cases = Seq(
      "%Y-%m-%d" -> "yyyy-MM-dd",
      "%d/%m/%y" -> "dd/MM/yy",
      "%H:%i:%S" -> "HH:mm:ss",
      "%W %e %b" -> "EEEE d MMM",
      "%l %p"    -> "h a",
      "%F %T"    -> "yyyy-MM-dd HH:mm:ss")
    for ((ch, jfmt) <- cases) {
      val got = spark.sql(
        s"SELECT formatDateTime(toDateTime('2024-03-07 13:04:05'), '$ch') AS f")
        .head().getString(0)
      val want = ts.format(java.time.format.DateTimeFormatter.ofPattern(jfmt))
      assert(got == want, s"'$ch': got '$got', want '$want'")
    }
  }
}
