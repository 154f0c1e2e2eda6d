package graft

/** Round 18: the system.parts footer walk at real part counts —
  * bounded-parallel listStatus/footer waves on the driver and an LRU
  * cache bound (the old bound CLEARED the whole cache at the cap,
  * dumping it exactly when it was most valuable). Measured rehearsal
  * numbers live in docs/AUDIT_parts_walk_r18.md. */
class Round18PartsWalkSpec extends SparkSpec {

  private def landPartitioned(name: String, parts: Int, rowsPerPart: Int): Unit = {
    dropWithLocation(name)
    spark.sql(s"""CREATE TABLE $name (id UInt64, p UInt32, v Float64)
                  ENGINE = MergeTree PARTITION BY p ORDER BY id""")
    spark.range(0, parts.toLong * rowsPerPart)
      .selectExpr("id", s"CAST(id % $parts AS INT) AS p", "id * 1.5 AS v")
      .repartition(4)
      .createOrReplaceTempView(s"${name}_src")
    // by-name: Spark floats the partition column to the end of the
    // physical schema, so a positional INSERT would cross the columns
    spark.sql(s"INSERT INTO $name (id, p, v) SELECT id, p, v FROM ${name}_src")
  }

  test("partitioned walk: per-part rows/files/bytes correct, second read is all cache hits") {
    landPartitioned("pw_t", parts = 40, rowsPerPart = 25)
    try {
      val q = "SELECT partition, rows, part_count FROM system.parts " +
        "WHERE table = 'pw_t' ORDER BY partition"
      val first = spark.sql(q).collect()
      assert(first.length == 40)
      assert(first.map(_.getLong(1)).sum == 1000L)
      assert(first.forall(_.getLong(2) >= 1L))
      // every parquet footer is now cached: a second read opens ZERO
      val before = graft.plans.SystemViews.footerReads.get()
      val second = spark.sql(q).collect()
      assert(second.map(_.getLong(1)).sum == 1000L)
      assert(graft.plans.SystemViews.footerReads.get() == before,
        "second system.parts read must be metadata-cache hits only")
      // a rewrite invalidates by (path, mtime, len): new files re-read
      spark.sql("INSERT INTO pw_t VALUES (100000, 7, 1.0)")
      spark.sql(q).collect()
      assert(graft.plans.SystemViews.footerReads.get() > before,
        "new files after an insert must be re-read")
    } finally dropWithLocation("pw_t")
  }

  test("LRU bound: cap smaller than the file count evicts oldest, never clears hot entries") {
    val oldMax = graft.plans.SystemViews.footerRowCacheMax
    // start from an empty cache: removeEldestEntry evicts ONE entry
    // per put, so a map already above a freshly-lowered cap would
    // keep every NEW entry and mask the eviction under test
    graft.plans.SystemViews.footerCacheReset()
    graft.plans.SystemViews.footerRowCacheMax = 8
    landPartitioned("pw_lru", parts = 30, rowsPerPart = 10)
    try {
      val q = "SELECT sum(rows) AS r FROM system.parts WHERE table = 'pw_lru'"
      assert(spark.sql(q).head.getLong(0) == 300L)
      val afterFirst = graft.plans.SystemViews.footerReads.get()
      // >8 files with an 8-entry cache: the second walk must re-read
      // SOME footers (eviction happened) but results stay correct
      assert(spark.sql(q).head.getLong(0) == 300L)
      assert(graft.plans.SystemViews.footerReads.get() > afterFirst,
        "with cap < file count the LRU must have evicted entries")
    } finally {
      graft.plans.SystemViews.footerRowCacheMax = oldMax
      dropWithLocation("pw_lru")
    }
  }
}
