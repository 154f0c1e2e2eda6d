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
  * Parametric-aggregate syntax (`quantile(0.5)(x)`, `topK(5)(v)`) is
  * handled upstream by [[ChSqlParser]], which flattens the two call
  * lists into one; the flattened spellings resolve here (`quantile` →
  * Percentile, `topK` → [[GraftTopK]]).
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
    // -- scalar functions the migrated corpus SQL emits verbatim
    // (/root/reference/src/corpus/orm_none.txt:463: `if(empty(category),
    // 'Uncategorized', category)`). `empty` treats NULL as empty: a
    // Postgres NULL lands as '' in ClickHouse's non-Nullable String
    // columns, so migrated predicates expect the two to coincide.
    "empty"    -> (es => Or(IsNull(es.head), EqualTo(Length(es.head), Literal(0)))),
    "notEmpty" -> (es => Not(Or(IsNull(es.head), EqualTo(Length(es.head), Literal(0))))),
    "ifNull"   -> (es => Coalesce(Seq(es(0), es(1)))),
    // C-semantics integral ops (ClickHouse modulo keeps the dividend's
    // sign; pmod is NOT the analog)
    "intDiv"   -> (es => new IntegralDivide(Cast(es(0), LongType), Cast(es(1), LongType))),
    "modulo"   -> (es => new Remainder(es(0), es(1))),
    // multiIf(c1, v1, c2, v2, …, else)
    "multiIf"  -> (es => {
      require(es.length >= 3 && es.length % 2 == 1,
        "multiIf takes cond/value pairs plus a final else")
      CaseWhen(es.init.grouped(2).map { case Seq(c, v) => (c, v) }.toSeq, Some(es.last))
    }),
    // -- parametric aggregates (flattened by ChSqlParser):
    //    quantile(0.5)(x) → quantile(0.5, x), etc.
    "quantile" -> (es => es match {
      case Seq(x)    => new Percentile(x, Literal(0.5))
      case Seq(p, x) => new Percentile(x, p)
      case _         => throw new IllegalArgumentException("quantile takes (level)(expr)")
    }),
    "quantileExact" -> (es => new Percentile(es(1), es(0))),
    "quantiles" -> (es => {
      require(es.length >= 2, "quantiles takes (l1, l2, …)(expr)")
      new Percentile(es.last, CreateArray(es.init))
    }),
    "median"   -> (es => new Percentile(es.head, Literal(0.5))),
    "topK" -> (es => es match {
      case Seq(x)    => GraftTopK(x, Literal(10))
      case Seq(k, x) => GraftTopK(x, k)
      case _         => throw new IllegalArgumentException("topK takes (k)(expr)")
    }),
    "groupArray" -> (es => CollectList(es.head)),
  )

  def register(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.ChDialect", name),
        builder))
    }
}
