package graft

import graft.sources.MergeTreeWrite
import org.apache.spark.sql.functions._

/** Round 13: bucket-count auto-dial — the last pinned layout dial
  * (q15b's `numBuckets = 8`) moved into code, per the round-12/13
  * "scale policy lives in code" program. */
class Round13ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("autoBucketCount: floors at 8, pow2, one bucket per ~256 MB, caps at 4096") {
    // range() stats are metadata (8 bytes/row), no job runs
    assert(MergeTreeWrite.autoBucketCount(spark.range(1000).toDF()) == 8)
    // 8 GB → 32 buckets of 256 MB
    assert(MergeTreeWrite.autoBucketCount(spark.range(1L << 30).toDF()) == 32)
    // 9 GB → rounds UP to the next pow2, never down past the target
    assert(MergeTreeWrite.autoBucketCount(spark.range((9L << 30) / 8).toDF()) == 64)
    // dial follows the LARGER side so both sides co-bucket at one count
    assert(MergeTreeWrite.autoBucketCount(
      spark.range(1000).toDF(), spark.range(1L << 30).toDF()) == 32)
    // 100 TB → capped, not 400k buckets
    assert(MergeTreeWrite.autoBucketCount(spark.range((100L << 40) / 8).toDF()) == 4096)
  }

  test("OrZero family: NULL input propagates NULL; only non-NULL parse failures become zero") {
    // CH ordinary functions propagate NULL args — OrZero(NULL) is
    // NULL, never a fabricated 0 (a review found Coalesce alone
    // couldn't tell "parse failed" from "input was NULL")
    val r = spark.sql(
      """SELECT toInt64OrZero(CAST(NULL AS STRING)) AS a,
               toInt32OrZero(CAST(NULL AS STRING)) AS b,
               toFloat64OrZero(CAST(NULL AS STRING)) AS c,
               toDecimal64OrZero(CAST(NULL AS STRING), 2) AS d,
               toUUIDOrZero(CAST(NULL AS STRING)) AS e,
               parseReadableSizeOrZero(CAST(NULL AS STRING)) AS f,
               accurateCastOrDefault(CAST(NULL AS STRING), 'Int64') AS g,
               toInt64OrZero('nope') AS h,
               toDecimal64OrZero('nope', 2) AS i,
               toUUIDOrZero('nope') AS j""").head()
    for (idx <- 0 to 6) assert(r.isNullAt(idx), s"column $idx must be NULL for NULL input")
    assert(r.getLong(7) == 0L)
    assert(r.getDecimal(8).compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(r.getString(9) == "00000000-0000-0000-0000-000000000000")
  }

  test("graft_pg_text_array: PG-faithful whitespace and unquoted backslash escapes") {
    def arr(lit: String): Seq[String] =
      spark.sql(s"SELECT graft_pg_text_array('$lit') AS a").head().getSeq[String](0)
    // whitespace around quoted elements is skipped, like PG array_in
    assert(arr("""{ "a", "b" }""") == Seq("a", "b"))
    assert(arr("""{"a" , "b"}""") == Seq("a", "b"))
    // backslash escapes in UNQUOTED elements: {a\\"b} is the chars a"b
    assert(arr("""{a\\"b}""") == Seq("a\"b"))
    // escaped NULL spelling is the STRING "NULL", not a null element
    assert(arr("""{\\N\\U\\L\\L}""") == Seq("NULL"))
    // bare unquoted NULL still null; escaped trailing space survives trim
    val withNull = spark.sql("""SELECT graft_pg_text_array('{a, NULL, c}') AS a""")
      .head().getSeq[String](0)
    assert(withNull == Seq("a", null, "c"))
    assert(arr("""{a\\ }""") == Seq("a "))
  }

  test("broadcastBytes follows the smaller of driver and executor heap") {
    assume(sys.env.get("SPARK_GRAFT_BROADCAST_MB").isEmpty)
    val key = "spark.executor.memory"
    assert(sys.props.get(key).isEmpty, "test needs the prop unset to start")
    try {
      sys.props(key) = "2g"
      // 2 GB / 16 = 128 MB — the executor bound wins over the big driver heap
      assert(GraftSession.broadcastBytes == (128L << 20))
    } finally sys.props.remove(key)
    // prop cleared: back to the driver-heap policy
    val driver = Runtime.getRuntime.maxMemory()
    assert(GraftSession.broadcastBytes ==
      math.min(math.max(driver / 16, 64L << 20), 512L << 20))
  }

  test("bucketed join under session policy: zero Exchange AND zero Sort (one file/bucket + ordering flag)") {
    // GraftSession sets spark.sql.legacy.bucketedTableScan.outputOrdering;
    // replicate it here (runtime-settable) and restore after — the
    // shared test session doesn't carry the production session policy
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val base = "/tmp/graft_bucket_sortfree_spec"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      Seq("bkt_sf_left", "bkt_sf_right").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val left = spark.range(1, 5000).select($"id".as("k"), ($"id" * 3).as("lv"))
      val right = spark.range(1, 15000).select(($"id" % 4999 + 1).as("k"), ($"id" * 7).as("rv"))
      MergeTreeWrite.writeBucketed(left, "bkt_sf_left", s"$base/l", "k", 8, Seq("k"))
      MergeTreeWrite.writeBucketed(right, "bkt_sf_right", s"$base/r", "k", 8, Seq("k"))
      // one file per bucket — the shape the ordering flag is sound for
      def files(p: String) = new java.io.File(p).listFiles()
        .count(f => f.getName.startsWith("part-"))
      assert(files(s"$base/l") == 8 && files(s"$base/r") == 8)
      val joined = spark.table("bkt_sf_left").hint("merge")
        .join(spark.table("bkt_sf_right"), "k")
        .groupBy("k").agg(sum($"rv").as("s"))
      joined.count() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // a SortExec prints as "Sort [keys...]" at ANY tree position
      // (+-, :-, codegen-starred); only SortMergeJoin shares the
      // prefix, excluded by the lookbehind
      assert("(?<!Merge)Sort \\[".r.findFirstIn(plan).isEmpty,
        s"bucketed sort order not honored:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("writeBucketed persists its count; landedBucketCount round-trips; marker-less is None") {
    val base = "/tmp/graft_bucket_marker_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.sql("DROP TABLE IF EXISTS bkt_marker_spec")
    val df = spark.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
    MergeTreeWrite.writeBucketed(df, "bkt_marker_spec", s"$base/t", "k", 16, Seq("k"))
    assert(MergeTreeWrite.landedBucketCount(s"$base/t").contains(16))
    assert(MergeTreeWrite.landedBucketCount(s"$base/nowhere").isEmpty)
  }
}
