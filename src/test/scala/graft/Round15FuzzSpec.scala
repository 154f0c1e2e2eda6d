package graft

/** Round-15 property fuzz over the two youngest correctness-critical
  * surfaces (VERDICT r14 task 2):
  *
  *  - projection auto-use staleness under RANDOM interleavings of
  *    INSERT / MATERIALIZE / CLEAR / query — the fingerprint guard
  *    (ProjectionAutoUse via ChCommands.tableProjections) must never
  *    let a stale layout answer, and every answer must equal the
  *    model computed from the base rows alone;
  *  - morton/hilbert encode∘decode round trips at every dimension
  *    and the 64/n bit-budget edges (MathKernels).
  */
class Round15FuzzSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fuzz: projection staleness under interleaved INSERT/MATERIALIZE/CLEAR never serves stale rows") {
    val rnd = new scala.util.Random(1501)
    for (trial <- 0 until 3) {
      val t = s"fuzz_proj_$trial"
      dropWithLocation(t) // clears projection sibling dirs too
      spark.sql(s"CREATE TABLE $t (k String, v Int64) ENGINE = MergeTree ORDER BY k")
      // model: the rows the base table holds, maintained in parallel
      val model = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      def insert(n: Int): Unit = {
        val rows = Seq.fill(n)((s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong))
        model ++= rows
        spark.sql(s"INSERT INTO $t VALUES " +
          rows.map { case (k, v) => s"('$k', $v)" }.mkString(", "))
      }
      insert(5 + rnd.nextInt(10))
      spark.sql(s"""ALTER TABLE $t ADD PROJECTION pa
                    (SELECT k, count(), sum(v) GROUP BY k)""")
      spark.sql(s"ALTER TABLE $t ADD PROJECTION ps (SELECT k, v ORDER BY v)")
      // the projection is FRESH right after ADD (it materializes);
      // every mutation of the base must flip it to unusable until the
      // next MATERIALIZE re-pins it
      var freshAgg = true
      var freshSort = true
      val ops = 14
      for (_ <- 0 until ops) {
        rnd.nextInt(5) match {
          case 0 | 1 => // INSERT: stales both layouts
            insert(1 + rnd.nextInt(4)); freshAgg = false; freshSort = false
          case 2 => // MATERIALIZE one of them
            if (rnd.nextBoolean()) { spark.sql(s"ALTER TABLE $t MATERIALIZE PROJECTION pa"); freshAgg = true }
            else { spark.sql(s"ALTER TABLE $t MATERIALIZE PROJECTION ps"); freshSort = true }
          case 3 => // CLEAR drops data, keeps declaration
            if (rnd.nextBoolean()) { spark.sql(s"ALTER TABLE $t CLEAR PROJECTION pa"); freshAgg = false }
            else { spark.sql(s"ALTER TABLE $t CLEAR PROJECTION ps"); freshSort = false }
          case _ => () // query-only step
        }
        // aggregate query: values must match the model EXACTLY, and
        // the projection scan may appear iff the layout is fresh
        val agg = spark.sql(s"SELECT k, count(*) AS c, sum(v) AS s FROM $t GROUP BY k")
        val got = agg.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val want = model.groupBy(_._1).map { case (k, rs) => k -> ((rs.size.toLong, rs.map(_._2).sum)) }
        assert(got == want, s"trial $trial: agg mismatch (freshAgg=$freshAgg)\ngot  $got\nwant $want")
        assert(planOf(agg).contains("_graft_proj_pa") == freshAgg,
          s"trial $trial: agg projection engagement != freshness $freshAgg\n${planOf(agg)}")
        // sort-layout query: same discipline on a leading-key filter
        val pick = if (model.nonEmpty) model(rnd.nextInt(model.size))._2 else 0L
        val srt = spark.sql(s"SELECT k, v FROM $t WHERE v = $pick")
        val gotS = srt.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
        val wantS = model.filter(_._2 == pick).sorted.toSeq
        assert(gotS == wantS, s"trial $trial: sort-path mismatch")
        assert(planOf(srt).contains("_graft_proj_ps") == freshSort,
          s"trial $trial: sort projection engagement != freshness $freshSort")
      }
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("fuzz: morton encode-decode round trips at every dimension and bit-budget edge") {
    val rnd = new scala.util.Random(1502)
    for (n <- 1 to 8) {
      val budget = 64 / n
      val maxV = if (budget >= 64) Long.MaxValue else (1L << budget) - 1
      def rndV(): Long =
        if (budget >= 64) rnd.nextLong() & Long.MaxValue else rnd.nextLong() >>> (64 - budget)
      // edges: all-zero, all-max (bit 63 set for n=2/4/8), mixed
      // edge/random inside the budget
      val edgeVals = Seq(0L, 1L, maxV, math.max(0L, maxV - 1))
      val cases = Seq.fill(12)(Seq.fill(n)(rndV())) ++
        Seq(Seq.fill(n)(0L), Seq.fill(n)(maxV), Seq.tabulate(n)(i => edgeVals(i % edgeVals.size)))
      for (vs <- cases) {
        val enc = spark.sql(s"SELECT mortonEncode(${vs.map(_ + "L").mkString(", ")}) AS c")
          .head().getLong(0)
        val dec = spark.sql(s"SELECT mortonDecode($n, ${enc}L) AS d").head().getStruct(0)
        val got = (0 until n).map(dec.getLong)
        assert(got == vs, s"morton n=$n: $vs -> $enc -> $got")
      }
      // one past the budget must throw (n >= 2; n=1's budget is all 64 bits)
      if (budget < 64)
        intercept[Exception](
          spark.sql(s"SELECT mortonEncode(${Seq.fill(n - 1)("0").mkString(", ")}, ${maxV + 1}L)")
            .collect())
    }
  }

  test("fuzz: hilbert 2-D encode-decode round trips at the 32-bit edges") {
    val rnd = new scala.util.Random(1503)
    val max32 = (1L << 32) - 1
    val edges = Seq(0L, 1L, 2L, max32, max32 - 1, 1L << 31, (1L << 31) - 1)
    val pts = (for (x <- edges; y <- edges) yield (x, y)) ++
      Seq.fill(40)((rnd.nextLong() & max32, rnd.nextLong() & max32))
    for ((x, y) <- pts) {
      val enc = spark.sql(s"SELECT hilbertEncode(${x}L, ${y}L) AS c").head().getLong(0)
      val dec = spark.sql(s"SELECT hilbertDecode(2, ${enc}L) AS d").head().getStruct(0)
      assert((dec.getLong(0), dec.getLong(1)) == ((x, y)), s"hilbert ($x, $y) -> $enc")
    }
    // CH doc example stays pinned through the fuzz
    assert(spark.sql("SELECT hilbertEncode(3, 4) AS v").head().getLong(0) == 31L)
    intercept[Exception](spark.sql(s"SELECT hilbertEncode(${max32 + 1}L, 0)").collect())
    intercept[Exception](spark.sql("SELECT hilbertEncode(-1, 0)").collect())
  }
}
