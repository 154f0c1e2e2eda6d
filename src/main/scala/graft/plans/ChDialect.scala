package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types.{DateType, LongType}
import org.apache.spark.unsafe.types.CalendarInterval

/** ClickHouse-dialect SQL function names registered straight into the
  * Catalyst function registry, so SQL text produced by the reference's
  * migration (toStartOfMonth, countIf, argMax, uniq, … — see
  * /root/reference/src/corpus/orm_none.txt:483-489) runs on
  * `spark.sql(...)` verbatim, resolved to the SAME native expressions
  * the Spark built-ins use (codegen, partial aggregation and pushdown
  * all intact). No text rewriting, no UDFs.
  *
  * Parametric-aggregate syntax (`quantile(0.5)(x)`) can't parse in
  * Spark SQL; those remain on the `graft.functions.ch` DataFrame
  * facade.
  */
object ChDialect {

  private def nullIfNot(cond: Expression, value: Expression): Expression =
    If(cond, value, Literal.create(null, value.dataType))

  /** name → (arity check, expression builder). */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "toStartOfYear"  -> (es => TruncTimestamp(Literal("year"), es.head)),
    "toStartOfMonth" -> (es => TruncTimestamp(Literal("month"), es.head)),
    // ClickHouse default mode 0 = Sunday-start: trunc(ts + 1d) - 1d
    "toStartOfWeek"  -> (es => TimestampAddInterval(
      TruncTimestamp(Literal("week"),
        TimestampAddInterval(es.head, Literal(new CalendarInterval(0, 1, 0L)))),
      Literal(new CalendarInterval(0, -1, 0L)))),
    "toMonday"       -> (es => TruncTimestamp(Literal("week"), es.head)),
    "toStartOfDay"   -> (es => TruncTimestamp(Literal("day"), es.head)),
    "toStartOfHour"  -> (es => TruncTimestamp(Literal("hour"), es.head)),
    "toYYYYMM"       -> (es => DateFormatClass(es.head, Literal("yyyyMM"))),
    "toDate"         -> (es => Cast(es.head, DateType)),
    "argMax"         -> (es => MaxBy(es(0), es(1))),
    "argMin"         -> (es => MinBy(es(0), es(1))),
    "uniq"           -> (es => HyperLogLogPlusPlus(es.head)),
    "countIf"        -> (es => CountIf(es.head)),
    "sumIf"          -> (es => Sum(nullIfNot(es(1), es(0)))),
    "avgIf"          -> (es => Average(nullIfNot(es(1), es(0)))),
    "maxIf"          -> (es => Max(nullIfNot(es(1), es(0)))),
    "minIf"          -> (es => Min(nullIfNot(es(1), es(0)))),
    "JSONExtractInt" -> (es =>
      Cast(GetJsonObject(es(0), Concat(Seq(Literal("$."), es(1)))), LongType)),
    "JSONExtractString" -> (es =>
      GetJsonObject(es(0), Concat(Seq(Literal("$."), es(1))))),
  )

  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.ChDialect", name),
        builder))
    }
}
