package graft.tools

import graft.GraftSession
import graft.sources.Tables

/** Round 19 — composed-query differential fuzz (verdict task 2).
  *
  * Round 18's dialect fuzz covered SCALAR families against Scala
  * models; the q95c divergence (DuckDB's double→bigint CAST rounds
  * where Spark/CH truncate) sat dormant for rounds because nothing
  * fuzzed WHOLE-QUERY compositions across the two engines. This
  * generator emits seeded agg × join × window × WITH FILL × set-op ×
  * LIMIT BY × scalar compositions over the gate tables as PAIRS:
  * the ClickHouse-dialect text this engine executes, and the ANSI
  * text DuckDB replays — the exact surface the driver's oracle walks.
  *
  * Determinism contract per shape (same as the registry's §5
  * conventions): total ORDER BY over the output, doubles rounded,
  * window ranks only over unique-per-partition sort keys.
  *
  * Two consumers:
  *  - `scripts/query_fuzz.sh` runs the main against an SF dir and
  *    replays every duck text through scripts/compare.py — the
  *    cross-engine audit (committed per round as
  *    docs/AUDIT_queryfuzz_r19.md);
  *  - Round19QueryFuzzSpec executes every Spark text in-suite (all
  *    must run, overwhelmingly non-empty) and pins TopKRewrite
  *    row-parity across the whole window family.
  */
object QueryFuzz {

  final case class Shape(name: String, spark: String, duck: String)

  /** Deterministic: same (seed, n) → same shapes. */
  def shapes(seed: Long, n: Int): Seq[Shape] = (0 until n).map { i =>
    val r = new scala.util.Random(seed * 1000003L + i)
    i % 13 match {
      case 0 => aggHaving(i, r)
      case 1 => condAgg(i, r)
      case 2 => joinAgg(i, r)
      case 3 => windowTop(i, r)
      case 4 => withFill(i, r)
      case 5 => setOp(i, r)
      case 6 => limitBy(i, r)
      case 7 => scalarDate(i, r)
      case 8 => castEdge(i, r)
      case 9 => dateArith(i, r)
      case 10 => decimalAgg(i, r)
      case 11 => fillInterpolate(i, r)
      case 12 => fillStaleness(i, r)
    }
  }

  /** WITH FILL … INTERPOLATE (v) — the carry semantics: each fill row
    * takes the previous OUTPUT row's value; before the first source
    * row the typed default (0) applies. The duck model replays the
    * carry with last_value IGNORE NULLS over the filled spine. */
  private def fillInterpolate(i: Int, r: scala.util.Random): Shape = {
    val w = 20 + r.nextInt(60)
    val e = 3000 + r.nextInt(20000)
    val a = r.nextInt(3)
    val b = a + 4 + r.nextInt(7)
    val s =
      s"""SELECT bucket, v FROM (
         |  SELECT bucket, round(max(value), 2) AS v FROM (
         |    SELECT CAST(floor(value / $w) AS INT) AS bucket, value
         |    FROM events WHERE event_id <= $e) t0 GROUP BY bucket) t1
         |ORDER BY bucket WITH FILL FROM $a TO $b STEP 1 INTERPOLATE (v)""".stripMargin
    val d =
      s"""WITH d AS (SELECT CAST(floor(value / $w) AS INT) AS bucket,
         |                  round(max(value), 2) AS v
         |           FROM events WHERE event_id <= $e GROUP BY 1),
         |     spine AS (SELECT unnest(generate_series($a, $b - 1, 1)) AS bucket
         |               UNION SELECT bucket FROM d),
         |     j AS (SELECT spine.bucket, d.v AS sv FROM spine LEFT JOIN d USING (bucket))
         |SELECT bucket,
         |       coalesce(last_value(sv IGNORE NULLS)
         |                OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |                0) AS v
         |FROM j ORDER BY bucket""".stripMargin
    Shape(f"fz$i%03d_fill_interp", s, d)
  }

  /** WITH FILL … STALENESS k — per-source-row bounded runs: each
    * source value v fills v+s, v+2s, … while < min(v+k, next source
    * value). The duck model replays the run arithmetic with lead() +
    * generate_series, mirroring the engine's union-of-runs shape. */
  private def fillStaleness(i: Int, r: scala.util.Random): Shape = {
    val w = 20 + r.nextInt(60)
    val e = 3000 + r.nextInt(20000)
    val k = 2 + r.nextInt(4)
    val st = 1 + r.nextInt(2)
    val s =
      s"""SELECT bucket, cnt FROM (
         |  SELECT bucket, count() AS cnt FROM (
         |    SELECT CAST(floor(value / $w) AS INT) AS bucket
         |    FROM events WHERE event_id <= $e) t0 GROUP BY bucket) t1
         |ORDER BY bucket WITH FILL STEP $st STALENESS $k""".stripMargin
    val d =
      s"""WITH d AS (SELECT CAST(floor(value / $w) AS INT) AS bucket, count(*) AS cnt
         |           FROM events WHERE event_id <= $e GROUP BY 1),
         |     runs AS (SELECT bucket AS v0,
         |                     least(bucket + $k,
         |                           coalesce(lead(bucket) OVER (ORDER BY bucket), bucket + $k)) - 1 AS vend
         |              FROM d),
         |     f AS (SELECT DISTINCT unnest(generate_series(v0 + $st, vend, $st)) AS bucket
         |           FROM runs WHERE v0 + $st <= vend)
         |SELECT bucket, cnt FROM d
         |UNION ALL
         |SELECT bucket, 0 AS cnt FROM f
         |ORDER BY bucket""".stripMargin
    Shape(f"fz$i%03d_fill_staleness", s, d)
  }

  /** The q95c divergence class, pinned EXECUTABLY: Spark (and CH)
    * TRUNCATE on double→integral CAST where DuckDB ROUNDS half-away —
    * the duck text must spell trunc() explicitly, exactly the
    * documented oracle convention every registry gate follows. */
  private def castEdge(i: Int, r: scala.util.Random): Shape = {
    val f = (5 + r.nextInt(20)) / 10.0
    val e = 3000 + r.nextInt(20000)
    val s =
      s"""SELECT CAST(value * $f AS BIGINT) AS b, count() AS c
         |FROM events WHERE event_id <= $e GROUP BY b ORDER BY b""".stripMargin
    val d =
      s"""SELECT CAST(trunc(value * $f) AS BIGINT) AS b, count(*) AS c
         |FROM events WHERE event_id <= $e GROUP BY b ORDER BY b""".stripMargin
    Shape(f"fz$i%03d_cast_edge", s, d)
  }

  /** Interval arithmetic + week bucketing: CH toMonday == DuckDB
    * date_trunc('week') (both Monday); the shifted date rides an
    * INTERVAL add through both engines. */
  private def dateArith(i: Int, r: scala.util.Random): Shape = {
    val x = 2000 + r.nextInt(8000)
    val nd = 1 + r.nextInt(40)
    val s =
      s"""SELECT CAST(toMonday(o_orderdate + INTERVAL $nd DAY) AS DATE) AS wk,
         |count() AS c FROM orders WHERE o_orderkey <= $x GROUP BY wk ORDER BY wk""".stripMargin
    val d =
      s"""SELECT CAST(date_trunc('week', o_orderdate + INTERVAL $nd DAY) AS DATE) AS wk,
         |count(*) AS c FROM orders WHERE o_orderkey <= $x GROUP BY wk ORDER BY wk""".stripMargin
    Shape(f"fz$i%03d_date_arith", s, d)
  }

  /** Exact decimal aggregation path: cast to DECIMAL(18,2), sum
    * exactly, surface as rounded double — any drift in the decimal
    * arithmetic (not double summation order) shows. */
  private def decimalAgg(i: Int, r: scala.util.Random): Shape = {
    val x = 2000 + r.nextInt(8000)
    def t(cnt: String) =
      s"""SELECT o_orderpriority AS k,
         |round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS s,
         |$cnt AS c FROM orders WHERE o_orderkey <= $x
         |GROUP BY o_orderpriority ORDER BY k""".stripMargin
    Shape(f"fz$i%03d_decimal_agg", t("count()"), t("count(*)"))
  }

  private def aggHaving(i: Int, r: scala.util.Random): Shape = {
    val x = 1000 + r.nextInt(9000)
    val h = 1 + r.nextInt(5)
    def t(cnt: String) =
      s"""SELECT o_orderpriority AS k, $cnt AS cnt,
         |round(sum(o_totalprice), 2) AS s, round(avg(o_totalprice), 2) AS a,
         |CAST(min(o_orderkey) AS BIGINT) AS mn
         |FROM orders WHERE o_orderkey <= $x
         |GROUP BY o_orderpriority HAVING $cnt >= $h ORDER BY k""".stripMargin
    Shape(f"fz$i%03d_agg_having", t("count()"), t("count(*)"))
  }

  private def condAgg(i: Int, r: scala.util.Random): Shape = {
    val v = 10 + r.nextInt(100)
    val e = 3000 + r.nextInt(20000)
    val s =
      s"""SELECT event_type AS k, countIf(value > $v) AS c1,
         |round(sumIf(value, value > $v), 2) AS s1,
         |round(maxIf(value, value <= $v), 2) AS m1
         |FROM events WHERE event_id <= $e GROUP BY event_type ORDER BY k""".stripMargin
    // CH's -If aggregates return the type default on an empty match
    // set (0, not NULL) — the duck text mirrors with coalesce
    val d =
      s"""SELECT event_type AS k,
         |count(*) FILTER (WHERE value > $v) AS c1,
         |round(coalesce(sum(value) FILTER (WHERE value > $v), 0), 2) AS s1,
         |round(coalesce(max(value) FILTER (WHERE value <= $v), 0), 2) AS m1
         |FROM events WHERE event_id <= $e GROUP BY event_type ORDER BY k""".stripMargin
    Shape(f"fz$i%03d_cond_agg", s, d)
  }

  private def joinAgg(i: Int, r: scala.util.Random): Shape = {
    val x = 2000 + r.nextInt(8000)
    val inner = r.nextBoolean()
    val t =
      if (inner)
        s"""SELECT c_nationkey AS k, count(*) AS cnt, round(sum(o_totalprice), 2) AS s
           |FROM customer JOIN orders ON o_custkey = c_custkey
           |WHERE o_orderkey <= $x GROUP BY c_nationkey ORDER BY k""".stripMargin
      else
        s"""SELECT c_nationkey AS k, count(o_orderkey) AS cnt, round(sum(o_totalprice), 2) AS s
           |FROM customer LEFT JOIN orders ON o_custkey = c_custkey AND o_orderkey <= $x
           |GROUP BY c_nationkey ORDER BY k""".stripMargin
    Shape(f"fz$i%03d_join_agg", t, t)
  }

  private def windowTop(i: Int, r: scala.util.Random): Shape = {
    val w = 20 + r.nextInt(60)
    val e = 3000 + r.nextInt(20000)
    val k = 2 + r.nextInt(4)
    val fn = Seq("row_number", "rank", "dense_rank")(r.nextInt(3))
    val dir = if (r.nextBoolean()) "DESC" else "ASC"
    // b is a GROUP key → unique per partition, so every rank flavor
    // is deterministic; rank()/dense_rank() exercise the round-19
    // tie-admitting TopKRewrite against DuckDB's window engine
    val t =
      s"""SELECT k1, b, cnt, rn FROM (
         |  SELECT k1, b, cnt, $fn() OVER (PARTITION BY k1 ORDER BY b $dir) AS rn FROM (
         |    SELECT event_type AS k1, CAST(floor(value / $w) AS INT) AS b, count(*) AS cnt
         |    FROM events WHERE event_id <= $e GROUP BY 1, 2) t0
         |) t1 WHERE rn <= $k ORDER BY k1, b, rn""".stripMargin
    Shape(f"fz$i%03d_window_$fn", t, t)
  }

  private def withFill(i: Int, r: scala.util.Random): Shape = {
    val w = 20 + r.nextInt(60)
    val e = 3000 + r.nextInt(20000)
    val a = r.nextInt(3)
    val b = a + 3 + r.nextInt(8)
    val st = 1 + r.nextInt(2)
    val s =
      s"""SELECT bucket, cnt FROM (
         |  SELECT bucket, count() AS cnt FROM (
         |    SELECT CAST(floor(value / $w) AS INT) AS bucket
         |    FROM events WHERE event_id <= $e) t0 GROUP BY bucket) t1
         |ORDER BY bucket WITH FILL FROM $a TO $b STEP $st""".stripMargin
    // CH fill: grid a, a+st, … strictly below b, PLUS every original
    // row (off-grid and outside the range survive); fill rows take 0
    val d =
      s"""WITH d AS (SELECT CAST(floor(value / $w) AS INT) AS bucket, count(*) AS cnt
         |           FROM events WHERE event_id <= $e GROUP BY 1),
         |     spine AS (SELECT unnest(generate_series($a, $b - 1, $st)) AS bucket
         |               UNION SELECT bucket FROM d)
         |SELECT spine.bucket, coalesce(d.cnt, 0) AS cnt
         |FROM spine LEFT JOIN d USING (bucket) ORDER BY bucket""".stripMargin
    Shape(f"fz$i%03d_with_fill", s, d)
  }

  private def setOp(i: Int, r: scala.util.Random): Shape = {
    val x = 1000 + r.nextInt(9000)
    val y = 50000 + r.nextInt(200000)
    val op = Seq("UNION ALL", "INTERSECT", "EXCEPT")(r.nextInt(3))
    val t =
      s"""SELECT o_orderpriority AS k FROM orders WHERE o_orderkey <= $x
         |$op
         |SELECT o_orderpriority AS k FROM orders WHERE o_totalprice > $y
         |ORDER BY k""".stripMargin
    Shape(f"fz$i%03d_setop", t, t)
  }

  private def limitBy(i: Int, r: scala.util.Random): Shape = {
    val x = 1000 + r.nextInt(9000)
    val n = 1 + r.nextInt(4)
    val s =
      s"""SELECT o_orderpriority AS k, o_orderkey AS id FROM orders
         |WHERE o_orderkey <= $x ORDER BY k, id LIMIT $n BY k""".stripMargin
    val d =
      s"""SELECT k, id FROM (
         |  SELECT o_orderpriority AS k, o_orderkey AS id,
         |         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn
         |  FROM orders WHERE o_orderkey <= $x) t
         |WHERE rn <= $n ORDER BY k, id""".stripMargin
    Shape(f"fz$i%03d_limit_by", s, d)
  }

  private def scalarDate(i: Int, r: scala.util.Random): Shape = {
    val x = 2000 + r.nextInt(8000)
    val dv = 100 + r.nextInt(900)
    val s =
      s"""SELECT CAST(toStartOfMonth(o_orderdate) AS DATE) AS m,
         |intDiv(o_orderkey, $dv) AS g, count() AS c
         |FROM orders WHERE o_orderkey <= $x GROUP BY m, g ORDER BY m, g""".stripMargin
    val d =
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         |CAST(floor(o_orderkey / $dv) AS BIGINT) AS g, count(*) AS c
         |FROM orders WHERE o_orderkey <= $x GROUP BY m, g ORDER BY m, g""".stripMargin
    Shape(f"fz$i%03d_scalar_date", s, d)
  }

  // --------------------------------------------------------- main

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** args: sfDir outDir [n] [seed] — writes outDir/<name>/ parquet per
    * shape plus oracle_sql.json; scripts/compare.py replays the duck
    * side. */
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 128
    val seed = if (args.length > 3) args(3).toLong else 19L
    val spark = GraftSession.local("graft-queryfuzz")
    val t = Tables(spark, sfDir)
    t.orders.createOrReplaceTempView("orders")
    t.events.createOrReplaceTempView("events")
    t.customer.createOrReplaceTempView("customer")
    t.lineitem.createOrReplaceTempView("lineitem")
    new java.io.File(outDir).mkdirs()
    val all = shapes(seed, n)
    all.foreach { sh =>
      try sh.name.synchronized {
        spark.sql(sh.spark).coalesce(1).write.mode("overwrite").parquet(s"$outDir/${sh.name}")
      } catch { case e: Throwable =>
        System.err.println(s"[fuzz] ${sh.name} failed: ${e.getMessage}")
      }
    }
    val json = all.map(sh => s"${jq(sh.name)}: ${jq(sh.duck)}").mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
