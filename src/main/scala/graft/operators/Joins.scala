package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse join-strictness analogs.
  *
  * `ANY LEFT JOIN` takes at most ONE right row per join key.
  * ClickHouse picks an arbitrary first match (its docs call the choice
  * undefined); a distributed engine should not ship nondeterminism, so
  * here the surviving right row is the MIN by `winnerOrd` — a total
  * order makes the join reproducible across runs, partitionings and
  * engines (hence oracle-able), at the cost ClickHouse also pays: one
  * shuffle of the right side to dedupe by key.
  *
  * At scale: the dedupe is a key-partitioned window (single shuffle,
  * AQE-skew-safe); the join then proceeds as Catalyst plans it —
  * broadcast when the deduped right side is small, sort-merge
  * otherwise.
  */
object Joins {

  private def dedupeRight(right: DataFrame, keys: Seq[String], winnerOrd: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(winnerOrd)
    right.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** ANY LEFT JOIN: every left row survives, joined to its key's
    * single winning right row (nulls when the key has none). */
  def anyLeft(left: DataFrame, right: DataFrame, keys: Seq[String], winnerOrd: Column): DataFrame =
    left.join(dedupeRight(right, keys, winnerOrd), keys, "left")

  /** ANY INNER JOIN: like anyLeft but drops left rows with no match. */
  def anyInner(left: DataFrame, right: DataFrame, keys: Seq[String], winnerOrd: Column): DataFrame =
    left.join(dedupeRight(right, keys, winnerOrd), keys, "inner")
}
