package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin`, on in
  * [[graft.GraftSession]]), which splits oversized shuffle partitions
  * at runtime. These helpers are for the cases AQE can't rewrite:
  * a broadcast-ineligible join against a dimension with a handful of
  * hot keys, or exact global distinct over a hot-keyed column.
  */
object Skew {

  /** Salted equi-join: the big side gets a uniform salt in
    * [0, saltCount), the small side is replicated `saltCount`× with
    * every salt value, and the join key becomes (key, salt) — hot keys
    * spread over `saltCount` reducers instead of one straggler.
    * Result columns = join on `keys` semantics (salt dropped).
    * Cost: small side shuffles `saltCount`× its size; pick the
    * smallest salt that flattens the stragglers. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltCount: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltCount > 1)
    // Outer-preserving the SMALL side would emit its unmatched rows
    // once per salt replica — restrict to the join types where the
    // replicated side only ever matches or drops.
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
        "left_semi", "leftanti", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types only, got $joinType")
    // Salt from a hash of the whole big-side row (deterministic for
    // retried tasks, uniform enough to flatten hot keys).
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltCount)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltCount - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase exact count-distinct for a hot-keyed group-by:
    * phase 1 dedups (keys, value) with the value itself spreading the
    * shuffle, phase 2 counts per key — no single reducer ever sees a
    * hot key's full row stream. */
  def skewedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"uniq_$valueCol"))
}
