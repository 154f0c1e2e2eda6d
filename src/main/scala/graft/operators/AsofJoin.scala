package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF JOIN — ClickHouse's temporal join: each left row matches the
  * latest right row with `rightTime <= leftTime` on the same key
  * (left-join semantics: unmatched left rows keep nulls).
  *
  * Spark-first plan: instead of a range join (quadratic per hot key)
  * or a custom physical operator, both sides are unioned with a side
  * marker and processed by ONE key-partitioned window ordered by
  * (time, marker): `last(right payload, ignoreNulls)` up to the
  * current row carries the most recent right match onto every left
  * row. Cost = one shuffle on the key + one sorted scan per side —
  * the same shape ClickHouse's sorted-merge ASOF executes, expressed
  * entirely in Catalyst operators (AQE, codegen and spill handling
  * apply for free).
  *
  * Right rows are first deduplicated to one per (key, time) — max
  * `tiebreakCol` wins — making equal-timestamp semantics
  * deterministic (and identical to DuckDB's ASOF, the oracle).
  */
object AsofJoin {

  /** @param left        probe side (all its columns are preserved)
    * @param right       build side (history to match against)
    * @param keyCols     equi-join key present on both sides
    * @param timeCol     event-time column name present on both sides
    * @param tiebreakCol right-side column breaking equal-time ties
    * @param rightCols   right-side payload columns, emitted as
    *                    `right_<name>`
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           timeCol: String, tiebreakCol: String, rightCols: Seq[String]): DataFrame = {
    require(!left.columns.exists(c =>
        c == "__side" || c.startsWith("__r_") || c.startsWith("right_")),
      "left side must not contain __side/__r_*/right_* columns")
    val key = keyCols.map(col)
    val r1 = Replicate.latestByKey(right, keyCols :+ timeCol, Seq(col(tiebreakCol)))
    // The whole right payload travels as ONE struct so a null payload
    // VALUE can never be skipped independently — last(ignoreNulls)
    // either takes the entire latest right row or none of it.
    val rSide = r1.select(
      (key :+ col(timeCol)) :+
        struct(rightCols.map(col): _*).as("__r") :+ lit(0).as("__side"): _*)
    val lSide = left.withColumn("__side", lit(1))
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)
    // right rows (__side 0) sort BEFORE left rows at equal time →
    // inclusive (<=) match semantics
    val w = Window.partitionBy(key: _*)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__m.$c").as(s"right_$c")): _*)
  }
}
