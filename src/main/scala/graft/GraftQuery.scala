package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named Spark query over a scale-factor
  * directory, plus (when SQL-expressible) an equivalent ANSI SQL text
  * the driver runs in DuckDB as the correctness oracle.
  *
  * Conventions that make the DuckDB hash-compare deterministic:
  *  - identical output column aliases on both sides;
  *  - a total ORDER BY over a unique key on both sides;
  *  - double aggregates rounded on both sides (floating-point sums
  *    are order-dependent under parallelism).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
