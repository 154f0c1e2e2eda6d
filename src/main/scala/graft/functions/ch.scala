package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse-style function surface, re-expressed as native Spark
  * (codegen'd) column functions — no UDFs.
  *
  * The reference migrates Postgres analytics to ClickHouse dialect
  * (see /root/reference/src/corpus/orm_none.txt:483-489 for
  * `toStartOfMonth`, and src/prompts/scanner.py:27-31 for the
  * aggregate family it targets). This facade gives a user of the
  * reference the same vocabulary on Spark.
  *
  * Everything here stays inside Catalyst so filter pushdown, partial
  * aggregation and whole-stage codegen keep working at 100 TB.
  */
object ch {

  // ---- date/time bucketing (toStartOf* family) ----
  def toStartOfMonth(c: Column): Column = date_trunc("month", c)
  /** ClickHouse toStartOfWeek defaults to mode 0 = SUNDAY-start weeks
    * (Spark's date_trunc('week') is Monday-start — that's toMonday). */
  def toStartOfWeek(c: Column, mode: Int = 0): Column =
    if (mode == 0) date_trunc("week", c + expr("INTERVAL 1 DAY")) - expr("INTERVAL 1 DAY")
    else date_trunc("week", c)
  def toMonday(c: Column): Column = date_trunc("week", c)
  def toStartOfDay(c: Column): Column   = date_trunc("day", c)
  def toStartOfHour(c: Column): Column  = date_trunc("hour", c)
  def toStartOfYear(c: Column): Column  = date_trunc("year", c)
  def toYYYYMM(c: Column): Column       = date_format(c, "yyyyMM")

  // ---- aggregate combinators ----
  /** argMax(value, ord): value of the row with max ord. Deterministic
    * only if `ord` is unique within the group — pass a composite
    * (e.g. struct or derived bigint) when it is not. */
  def argMax(value: Column, ord: Column): Column = max_by(value, ord)
  def argMin(value: Column, ord: Column): Column = min_by(value, ord)

  /** uniq: HyperLogLog approximate distinct (merge-able at scale). */
  def uniq(c: Column, rsd: Double = 0.05): Column = approx_count_distinct(c, rsd)
  def uniqExact(c: Column): Column = countDistinct(c)

  // -If combinators: aggregate only rows matching a predicate.
  def countIf(cond: Column): Column = count(when(cond, lit(1)))
  def sumIf(c: Column, cond: Column): Column = coalesce(sum(when(cond, c)), lit(0.0))
  def avgIf(c: Column, cond: Column): Column = avg(when(cond, c))
  def maxIf(c: Column, cond: Column): Column = max(when(cond, c))
  def minIf(c: Column, cond: Column): Column = min(when(cond, c))

  /** quantile: exact percentile with linear interpolation
    * (ClickHouse `quantileExact`/`quantile` analog). */
  def quantile(c: Column, q: Double): Column = percentile(c, lit(q))
  /** quantileTDigest analog — approximate, mergeable, for 100 TB paths. */
  def quantileApprox(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  /** groupArray with deterministic (sorted) order. */
  def groupArraySorted(c: Column): Column = sort_array(collect_list(c))
  def groupUniqArray(c: Column): Column = sort_array(collect_set(c))

  /** any(heavy-ish deterministic stand-in): first value by explicit order. */
  def anyByOrder(value: Column, ord: Column): Column = min_by(value, ord)

  // ---- operator-level helpers ----

  /** topK per group: the k most frequent `value`s within each group —
    * ClickHouse `topK(k)(value)` analog. Exact (two-shuffle) variant;
    * at very high key cardinality swap in countMinSketch.
    * Deterministic: ties broken by value. */
  def topKByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String, k: Int): DataFrame = {
    val counted = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col(valueCol))
    counted.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Per-group pivot counts with a FIXED value list (single-pass
    * conditional aggregation — scales better than DataFrame.pivot's
    * two-pass value discovery and keeps the plan static). */
  def pivotCount(df: DataFrame, groupCol: String, pivotCol: String, values: Seq[String]): DataFrame = {
    val aggs = values.map(v => countIf(col(pivotCol) === v).as(v))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  // ---- scalar conveniences ----
  /** multiIf(c1, v1, c2, v2, …, else): first matching branch wins. */
  def multiIf(branches: Seq[(Column, Column)], otherwise: Column): Column =
    branches.foldRight(otherwise) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  /** arrayJoin ≡ explode (one output row per array element). */
  def arrayJoin(c: Column): Column = explode(c)

  def ifNull(c: Column, default: Column): Column = coalesce(c, default)
  /** Integral division (no double round-trip — exact past 2^53). */
  def intDiv(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))
  /** C-style remainder (sign of dividend), matching ClickHouse modulo;
    * pmod is NOT the analog — it differs for negative dividends. */
  def modulo(a: Column, b: Column): Column = a % b
  /** positiveModulo analog (always non-negative). */
  def positiveModulo(a: Column, b: Column): Column = pmod(a, b)

  // ---- JSON extraction (JSONExtract* family) ----
  /** JSONExtractInt(json, '$.path') — codegen'd path extraction. */
  def jsonExtractInt(c: Column, path: String): Column =
    get_json_object(c, path).cast("long")
  def jsonExtractFloat(c: Column, path: String): Column =
    get_json_object(c, path).cast("double")
  def jsonExtractString(c: Column, path: String): Column =
    get_json_object(c, path)

  /** Deterministic systematic sample: keep keys with hash(key) ≡ 0
    * (mod `outOf`). Unlike fraction sampling this is stable across
    * runs, engines and partitionings — the property a reproducible
    * training-data pipeline needs. */
  def systematicSample(key: Column, outOf: Int): Column =
    pmod(key, lit(outOf)) === 0
}
