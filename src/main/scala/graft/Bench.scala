package graft

import java.nio.file.{Files, Paths}

/** Benchmark main. Two outputs, by design:
  *
  *  1. A FULL machine-readable artifact — every query's seconds plus any
  *     error — written by this process itself to a repo file
  *     (`SPARK_GRAFT_BENCH_OUT`, default `/root/repo/BENCH_local.json`)
  *     and committed per round. Earlier rounds tried to squeeze all 159
  *     per-query times into the one stdout line and the driver's bounded
  *     log tail truncated it (`BENCH_r08/r09 "parsed": null`); a file the
  *     benchmark writes directly can't be truncated by log capture.
  *  2. ONE compact stdout JSON line for the driver: total, count, the
  *     top-10 slowest queries, error count, and a pointer to the full
  *     artifact. Stays well under the driver's 2000-char tail.
  *
  * A query that throws is NOT timed as if it ran (the old
  * `catch { case _ => () }` benched crashes at near-zero): its wall time
  * is still recorded but it is excluded from the total and listed under
  * `"errors"` with the exception summary.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Optional comma-separated allowlist for targeted scale rehearsals
    // (e.g. the sf100 heavy-family subset) — absent means the full
    // registry. A typo'd name would silently bench nothing, so every
    // name must exist; and a subset run must not overwrite the
    // committed full-registry artifact, so its default output moves
    // to /tmp.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined || sys.env.get("SPARK_GRAFT_BENCH_MATERIALIZE").contains("1"))
        "/tmp/graft_bench_subset.json"
      else "/root/repo/BENCH_local.json")
    val spark = GraftSession.local("graft-bench")
    // Warm the JVM/codegen/parquet-reader paths so startup cost isn't
    // attributed to whichever query happens to run first.
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    // …including the full spark.sql path (ANTLR + the injected dialect
    // parser + aggregate codegen): without this, the first SQL-heavy
    // registry query absorbs several seconds of one-time parser and
    // whole-stage-codegen warmup and its number stops meaning anything.
    spark.range(0, 1000).createOrReplaceTempView("graft_warmup")
    spark.sql("""SELECT id % 3 AS g, count(*) AS c, quantile(0.5)(id) AS p50,
                        max(toString(id)) AS s
                 FROM graft_warmup GROUP BY 1 ORDER BY g""").collect()
    try spark.read.parquet(s"$sfDir/region.parquet")
      .selectExpr("count(*)", "max(r_regionkey)").collect()
    catch { case _: Throwable => () }
    // The host this runs on shows multi-x run-to-run variance (shared
    // VM); a second pass with min-of-two removes most of that noise.
    // EVERY query retries — under host contention the first pass of
    // every query is inflated, so a "skip retry if slow" rule skips
    // exactly the queries that need the retry most. A 20 s cap still
    // bounds total bench time on a pathological host.
    // Run-condition markers: the r10 judgment lost an hour attributing
    // a 96 s driver rerun vs a 58 s committed artifact (first-parse JIT
    // + host contention, not plan changes). The artifact now carries the
    // host load average at start/end and EVERY run's seconds per query,
    // so warm-vs-cold and contended-vs-idle are self-describing.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    // min-of-two retry cutoff (seconds). Overridable so the noise-audit
    // machinery below is exercisable at smoke scale; the committed
    // artifacts always use the default 20 s.
    val retryCutoff = sys.env.get("SPARK_GRAFT_BENCH_RETRY_CUTOFF").map(_.toDouble).getOrElse(20.0)
    // SPARK_GRAFT_BENCH_MATERIALIZE=1: time full-result computation
    // (hash-reduce every column) instead of count() — see the
    // execution site below. Subset-style default-out guard applies:
    // a materialize run must not overwrite the committed artifact.
    val materialize = sys.env.get("SPARK_GRAFT_BENCH_MATERIALIZE").contains("1")
    // `setup` is the fixture-build time the DDL/streaming chain
    // queries self-report through FixtureClock (landing writes, CH
    // table loads) — work that exists only because the gate rebuilds
    // its inputs every run. `sec - setup` is the plan-dominated time a
    // regression would actually show up in; by round 13 the artifact's
    // whole top-10 was fixture-dominated and a 1.62× "regression" on
    // code-unchanged q103 turned out to be landing-write noise.
    final case class R(sec: Double, setup: Double, err: Option[String],
                       spillMem: Long = 0L, spillDisk: Long = 0L)
    // Per-query spill accounting (round 17): the q16 sf100 forensics
    // took an idle host and three scales to adjudicate because the
    // artifact couldn't say whether a slow cell SPILLED or was merely
    // contended. Task-end metrics accumulate here; the listener bus is
    // drained (GraftSparkBridge) before each snapshot so a query's
    // spill can't leak into its successor's delta.
    val spillMemTotal = new java.util.concurrent.atomic.AtomicLong
    val spillDiskTotal = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spillMemTotal.addAndGet(m.memoryBytesSpilled)
          spillDiskTotal.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    def spillSnapshot(): (Long, Long) = {
      org.apache.spark.graftbridge.GraftSparkBridge.drainListenerBus(spark.sparkContext)
      (spillMemTotal.get, spillDiskTotal.get)
    }
    // Plan fingerprint (round 16): #shuffle Exchanges, #BroadcastExchanges,
    // #Sorts, #scans parsed once per query from the executed-plan string
    // (the AQE INITIAL plan — deterministic, and exactly where a rule
    // regression shows up). The audit below diffs it against the previous
    // artifact so a PLAN regression is caught even when wall time hides
    // it (q15b's ex=0 promise was previously asserted only in its gate).
    // `wgl` (round 17): #WindowGroupLimit nodes — Spark 4.1's rank-limit
    // pushdown. The q16 class of regressions (a top-k-per-group window
    // silently losing its pushdown and full-sorting the fact table) is
    // only artifact-visible if this count is pinned per round.
    final case class FP(ex: Int, bex: Int, sort: Int, scan: Int, wgl: Int) {
      def json: String = s"""{"ex":$ex,"bex":$bex,"sort":$sort,"scan":$scan,"wgl":$wgl}"""
    }
    def fingerprint(plan: org.apache.spark.sql.execution.SparkPlan): Option[FP] =
      try {
        val s = plan.toString
        def cnt(re: scala.util.matching.Regex) = re.findAllMatchIn(s).size
        Some(FP(
          cnt("""(?m)(?:^|\s|\+- |:- )Exchange """.r),
          cnt("""BroadcastExchange""".r),
          cnt("""(?m)(?:^|\s|\+- |:- )Sort \[""".r),
          cnt("""FileScan|BatchScan""".r),
          cnt("""WindowGroupLimit""".r)))
      } catch { case _: Throwable => None }
    final case class Q(best: R, runs: Seq[Double], fp: Option[FP])
    val results: Seq[(String, Q)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        var fp: Option[FP] = None
        def once(takeFp: Boolean): R = {
          FixtureClock.reset()
          val (sm0, sd0) = spillSnapshot()
          val t0 = System.nanoTime()
          val err =
            try {
              val df = fn(spark, sfDir)
              // fingerprint must read the plan BEFORE execution (the
              // AQE initial plan is the deterministic one), so it
              // cannot leave the timed window — but its stringify +
              // regex cost is fixture-class, not plan cost, and run 2
              // does not carry it: bracket JUST that so work-time
              // (sec − setup, what the audit compares) stays
              // symmetric. Plan MATERIALIZATION stays unbracketed —
              // run 2 pays optimizer+planning inside count() too, so
              // bracketing it would skew run 1's work-time low.
              if (takeFp) {
                val plan = df.queryExecution.executedPlan
                FixtureClock.time { fp = fingerprint(plan) }
              }
              // Default df.count(): comparable across rounds, but a
              // map-only query benches as scan cost — Spark prunes
              // every column a count doesn't need, so a codegen'd
              // kernel regression in e.g. the BPE encode path never
              // moves the cell. The opt-in forces every output column
              // to be COMPUTED and reduced (one xxhash64 over the
              // row, min-aggregated — no collect, no extra shuffle)
              // for kernel-cost profiling; committed artifacts keep
              // the count() path for comparability.
              if (materialize)
                df.selectExpr("min(xxhash64(struct(*)))").collect()
              else df.count()
              None
            }
            catch { case e: Throwable =>
              Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
            }
          val sec = (System.nanoTime() - t0) / 1e9
          val (sm1, sd1) = spillSnapshot()
          R(sec, FixtureClock.nanos / 1e9, err, sm1 - sm0, sd1 - sd0)
        }
        val r1 = once(takeFp = true)
        if (r1.err.isDefined) name -> Q(r1, Seq(r1.sec), fp) // don't re-run a crash just to time it
        else if (r1.sec < retryCutoff) {
          val r2 = once(takeFp = false)
          name -> Q(if (r2.err.isEmpty && r2.sec < r1.sec) r2 else r1, Seq(r1.sec, r2.sec), fp)
        }
        else name -> Q(r1, Seq(r1.sec), fp)
      }
    val loadEnd = osBean.getSystemLoadAverage

    // ----------------------------------------------------------------
    // Mechanical noise audit (round 15): a serial full-registry pass
    // self-contends (load >10 at sf100), and single-run cells above
    // the 20 s retry cutoff keep whatever moment they got — in rounds
    // 13/14 every hand-checked "regression" (q57 4.7×, q74 50×,
    // q03 2×) vanished when re-run alone. The manual "re-run what
    // looks regressed" discipline missed q03_monthly in r14, so it is
    // now the harness's job: point SPARK_GRAFT_BENCH_PREV at the
    // previous committed artifact and every ok cell that (a) ran once
    // (>20 s, no retry), and (b) moved >1.5× vs that artifact, is
    // re-run ISOLATED after the serial pass (host load is this
    // process alone by then) and the three numbers land in the
    // artifact's "audit" table with a noise/regression verdict.
    final case class Audit(serial: Double, prev: Double, isolated: Double, setup: Double,
                           loadAtRerun: Double, serialSpillDisk: Long, isolatedSpillDisk: Long) {
      // WORK-time vs WORK-time: `prev` already has the prior run's
      // fixture seconds subtracted (below), so the comparison can't
      // be gamed either way by fixture noise. A crashed re-run is its
      // own verdict — never "noise".
      def verdict: String =
        if (isolated < 0) "rerun_error"
        else if (math.max(0.0, isolated - setup) <= 1.5 * prev) "noise"
        else "regression"
    }
    // Previous per-query WORK seconds (total minus the artifact's
    // recorded fixture setup, when present). Accepts Bench's own
    // artifact (top-level "queries"/"setup") or the driver's
    // BENCH_r{N}.json wrapper ("parsed" → "queries").
    val prevTimes: Map[String, Double] = sys.env.get("SPARK_GRAFT_BENCH_PREV").map { p =>
      import org.json4s._
      val root = org.json4s.jackson.JsonMethods.parse(Files.readString(Paths.get(p)))
      def numMap(v: JValue): Map[String, Double] = v match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(x)) => k -> x
          case (k, JInt(x)) => k -> x.toDouble
        }.toMap
        case _ => Map.empty
      }
      val qs = root \ "queries" match {
        case o: JObject => numMap(o)
        case _ => numMap(root \ "parsed" \ "queries")
      }
      val st = numMap(root \ "setup")
      qs.map { case (k, v) => k -> math.max(0.0, v - st.getOrElse(k, 0.0)) }
    }.getOrElse(Map.empty)
    // Previous plan fingerprints (absent in pre-round-16 artifacts →
    // empty diff; from round 16 on, any count change is reported).
    val prevPlans: Map[String, (Int, Int, Int, Int, Int)] = sys.env.get("SPARK_GRAFT_BENCH_PREV").map { p =>
      import org.json4s._
      val root = org.json4s.jackson.JsonMethods.parse(Files.readString(Paths.get(p)))
      def i(v: JValue): Int = v match {
        case JInt(x) => x.toInt; case JDouble(x) => x.toInt; case _ => -1
      }
      // same two shapes as prevTimes: Bench's own artifact (top-level
      // "plan") or the driver's wrapper ("parsed" → "plan") — a
      // wrapper input must not silently disable plan-diff detection
      // wgl reads -1 from pre-round-17 artifacts (field absent) → the
      // diff below skips the wgl comparison for those, so adding the
      // column doesn't flag all 208 queries as "changed" once.
      def planMap(v: JValue): Map[String, (Int, Int, Int, Int, Int)] = v match {
        case JObject(fields) => fields.collect {
          case (k, o: JObject) =>
            k -> (i(o \ "ex"), i(o \ "bex"), i(o \ "sort"), i(o \ "scan"), i(o \ "wgl"))
        }.toMap
        case _ => Map.empty[String, (Int, Int, Int, Int, Int)]
      }
      root \ "plan" match {
        case o: JObject => planMap(o)
        case _ => planMap(root \ "parsed" \ "plan")
      }
    }.getOrElse(Map.empty)
    val planDiffs: Seq[(String, String)] = results.collect {
      case (name, q) if q.fp.isDefined && prevPlans.contains(name) && {
          val f = q.fp.get; val (pe, pb, ps, pc, pw) = prevPlans(name)
          (f.ex, f.bex, f.sort, f.scan) != ((pe, pb, ps, pc)) ||
            (pw >= 0 && f.wgl != pw)
        } =>
        val (pe, pb, ps, pc, pw) = prevPlans(name)
        val prevWgl = if (pw >= 0) s""","wgl":$pw""" else ""
        name -> (s"""{"prev":{"ex":$pe,"bex":$pb,"sort":$ps,"scan":$pc$prevWgl},""" +
          s""""now":${q.fp.get.json}}""")
    }
    val auditCandidates: Seq[(String, R)] =
      if (prevTimes.isEmpty) Nil
      else results.collect {
        case (name, Q(best, runs, _)) if best.err.isEmpty && runs.size == 1 && best.sec > retryCutoff &&
            prevTimes.get(name).exists(p => p > 0 && math.max(0.0, best.sec - best.setup) > 1.5 * p) =>
          name -> best
      }
    val audits: Seq[(String, Audit)] = auditCandidates.map { case (name, best) =>
      // "isolated" has to MEAN isolated: the serial pass just ended, so
      // the host load is still draining and the JVM carries 200 queries
      // of garbage — re-running immediately re-measures the contention
      // the audit exists to rule out (r15 dry-run: q36b read 49 s in
      // the audit, 12.7 s on an idle host). Settle first, and escalate
      // to a second run before calling anything a regression.
      def settle(): Unit = {
        System.gc()
        var waited = 0
        while (osBean.getSystemLoadAverage > 4.0 && waited < 90) {
          Thread.sleep(5000); waited += 5
        }
      }
      def once(): (Double, Double, Long) = {
        FixtureClock.reset()
        val (_, sd0) = spillSnapshot()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val (_, sd1) = spillSnapshot()
          (sec, FixtureClock.nanos / 1e9, sd1 - sd0)
        }
        catch { case _: Throwable => (-1.0, 0.0, 0L) }
      }
      settle()
      val load = osBean.getSystemLoadAverage
      val prev = prevTimes(name)
      var (iso, setup, isoSpill) = once()
      if (iso >= 0 && math.max(0.0, iso - setup) > 1.5 * prev) {
        settle() // looks regressed — confirm on a second settled run
        val (iso2, setup2, isoSpill2) = once()
        // keep the better WORK time (the verdict's unit) — comparing
        // totals would let slow fixture rebuilds discard a confirm
        // run that proved the plan time is fine
        if (iso2 >= 0 && math.max(0.0, iso2 - setup2) < math.max(0.0, iso - setup)) {
          iso = iso2; setup = setup2; isoSpill = isoSpill2
        }
      }
      name -> Audit(best.sec, prev, iso, setup, load, best.spillDisk, isoSpill)
    }

    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val ok = results.filter(_._2.best.err.isEmpty)
    val errs = results.collect { case (n, Q(R(_, _, Some(e), _, _), _, _)) => n -> e }
    val total = ok.map(_._2.best.sec).sum
    def workOf(r: R): Double = math.max(0.0, r.sec - r.setup)
    val workTotal = ok.map(q => workOf(q._2.best)).sum
    val allQs = results.map { case (k, v) => jstr(k) + ":" + ms(v.best.sec) }
      .mkString("{", ",", "}")
    // fixture-build seconds self-reported by the chain queries (only
    // entries that actually reported setup) — query_s = queries - setup
    val setupJson = results.filter(_._2.best.setup > 0.0005)
      .map { case (k, v) => jstr(k) + ":" + ms(v.best.setup) }
      .mkString("{", ",", "}")
    // every run's seconds: a 1-element array marks a cold single run
    // (error or >20 s), a 2-element array is min-of-two
    val runsJson = results.map { case (k, v) =>
      jstr(k) + ":" + v.runs.map(ms).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errs.map { case (k, e) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val planJson = results.collect { case (k, q) if q.fp.isDefined =>
      jstr(k) + ":" + q.fp.get.json
    }.mkString("{", ",", "}")
    val planDiffJson = planDiffs.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // the harness-generated audit table (empty when no PREV artifact
    // was supplied or nothing tripped the 20 s + 1.5× gate)
    val auditJson = audits.map { case (k, a) =>
      jstr(k) + s""":{"serial":${ms(a.serial)},"prev_work":${ms(a.prev)},"isolated":${ms(a.isolated)},""" +
        s""""isolated_setup":${ms(a.setup)},"load_at_rerun":${ms(a.loadAtRerun)},""" +
        s""""serial_spill_disk":${a.serialSpillDisk},"isolated_spill_disk":${a.isolatedSpillDisk},""" +
        s""""verdict":${jstr(a.verdict)}}"""
    }.mkString("{", ",", "}")
    // spill table (round 17): only the queries that actually spilled,
    // bytes from the KEPT run (the same run "queries" reports). A slow
    // cell with zero spill is contention; one with gigabytes here is a
    // memory-pressure finding — self-identifying in the artifact.
    val spillJson = results
      .filter { case (_, q) => q.best.spillMem > 0 || q.best.spillDisk > 0 }
      .map { case (k, q) => jstr(k) + s""":{"mem":${q.best.spillMem},"disk":${q.best.spillDisk}}""" }
      .mkString("{", ",", "}")
    // "cpus" must report the CONTRACT value — the SPARK_GRAFT_CPUS core
    // count the session's local[$cores] master was actually built with
    // (GraftSession), not availableProcessors: the driver's low-core
    // scaling run (SPARK_GRAFT_CPUS=8 on a 32-CPU host) previously
    // printed "cpus":32 and its whole scaling block read as suspect.
    // defaultParallelism is the engine-side witness of the same value.
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.trim.toIntOption)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val cond = s""""load_avg_start":${ms(loadStart)},"load_avg_end":${ms(loadEnd)},""" +
      s""""cpus":$cpus,"parallelism":${spark.sparkContext.defaultParallelism},""" +
      s""""timing":"min_of_two_unless_cold""""
    val common =
      s""""metric":"total","value":${ms(total)},"unit":"sec","count":${results.size},"ok":${ok.size},"sf":${jstr(sfDir)}"""
    // Full artifact: every query, every error — the committed evidence.
    Files.writeString(Paths.get(outPath),
      s"""{$common,$cond,"work_total":${ms(workTotal)},"queries":$allQs,"setup":$setupJson,"runs":$runsJson,"errors":$errJson,"audit":$auditJson,"plan":$planJson,"plan_diff":$planDiffJson,"spill":$spillJson}\n""")
    // Stdout: driver-parseable summary that fits a bounded log tail.
    // Top-10 ranks on PLAN-dominated seconds (total minus reported
    // fixture time) so a plan regression can't hide in fixture noise.
    val top10 = ok.sortBy(q => -workOf(q._2.best)).take(10)
      .map { case (k, v) => jstr(k) + ":" + ms(workOf(v.best)) }.mkString("{", ",", "}")
    val auditSummary =
      if (audits.isEmpty) "0"
      else s"${audits.size}(${audits.count(_._2.verdict == "regression")} regression)"
    val spilledCount = results.count { case (_, q) => q.best.spillMem > 0 || q.best.spillDisk > 0 }
    println(s"""{$common,$cond,"work_total":${ms(workTotal)},"queries":$top10,"errors":${errs.size},"audited":${jstr(auditSummary)},"plan_diffs":${planDiffs.size},"spilled":$spilledCount,"detail":${jstr(outPath)}}""")
    spark.stop()
  }
}
