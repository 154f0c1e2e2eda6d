package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Round}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, CentralMomentAgg, Corr, Covariance, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, MapType, StructType}

/** SURVEY §5 scalar-output contract, enforced: the driver's DuckDB
  * comparator (pandas sort + hash) crashes on array/map/struct cells,
  * so every registry query must emit atomic columns only — arrays are
  * serialized with arrayStringConcat on the Spark side and
  * array_to_string on the oracle side. Round 7 shipped 7 queries that
  * violated this and went red at the gate; this spec makes the
  * violation a local test failure instead. Schemas are resolved by
  * analysis only (no job runs) at sf0.001.
  */
class SchemaGuardSpec extends SparkSpec {

  test("every registry query's output schema is atomic (no array/map/struct columns)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.registry.flatMap { q =>
      val schema = q.run(spark, dir).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.isEmpty) None else Some(s"${q.name} -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"registry queries with non-atomic output columns (violates SURVEY §5):\n  ${offenders.mkString("\n  ")}")
  }

  test("every registry query ends in a global ORDER BY (or is a single-row aggregate)") {
    val dir = "/root/testdata/sf0.001"
    // walk through the nodes that legally sit above the final sort
    @annotation.tailrec
    def terminalSort(p: LogicalPlan): Boolean = p match {
      case s: Sort => s.global
      case w: WithCTE => terminalSort(w.plan)
      case _: Project | _: GlobalLimit | _: LocalLimit | _: SubqueryAlias | _: Filter =>
        terminalSort(p.children.head)
      // LIMIT n OFFSET m over a total sort is equally deterministic
      case o: Offset => terminalSort(o.child)
      // ungrouped aggregate = exactly one row; order is vacuous
      case a: Aggregate => a.groupingExpressions.isEmpty
      // a single-row introspection command (SHOW CREATE TABLE) —
      // exactly one row by construction; order is vacuous
      case _: graft.plans.ChShowCreateTableCommand => true
      case _ => false
    }
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.analyzed
      if (terminalSort(plan)) None
      else Some(s"${q.name} -> root ${plan.nodeName}")
    }
    assert(offenders.isEmpty,
      "registry queries without a deterministic total ORDER BY (violates SURVEY §5):\n  " +
        offenders.mkString("\n  "))
  }

  test("order-sensitive double aggregates reach the output only through round()") {
    val dir = "/root/testdata/sf0.001"
    // sum/avg/moment aggregates over floating point are
    // summation-order-dependent: bit-level results vary with
    // partitioning, so the DuckDB hash compare only holds under the
    // §5 round(…, 2..6) convention. min/max/first/selection-based
    // quantiles are order-independent and exempt.
    def orderSensitive(e: Expression): Boolean = e.exists {
      case ae: AggregateExpression => ae.aggregateFunction match {
        case s: Sum     => s.dataType == DoubleType
        case _: Average => ae.dataType == DoubleType
        case _: CentralMomentAgg | _: Corr | _: Covariance => true
        case _ => false
      }
      case _ => false
    }
    def rounded(e: Expression): Boolean = e.exists {
      case _: Round => true
      // integer cast truncates float noise just as decisively
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        Set[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType
        ).contains(c.dataType)
      case _ => false
    }
    // Documented exemption: q29b's SUM(amount) runs the reference
    // corpus text VERBATIM (it must not be edited) and its amount is
    // round(o_totalprice) — an integer-valued double, whose sum is
    // exact in IEEE arithmetic at any summation order.
    val exempt = Set("q29b_corpus_category -> total")
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, dir).queryExecution.analyzed
      val outIds = plan.output.collect {
        case a: Attribute if a.dataType == DoubleType || a.dataType == FloatType => a.exprId
      }.toSet
      if (outIds.isEmpty) None
      else {
        val producing = plan.collect { case n => n.expressions }.flatten
          .flatMap(_.collect { case al: Alias if outIds.contains(al.exprId) => al })
        val bad = producing.filter(al => orderSensitive(al.child) && !rounded(al.child))
          .map(_.name).distinct
        if (bad.isEmpty) None else Some(s"${q.name} -> ${bad.mkString(", ")}")
      }
    }.filterNot(exempt)
    assert(offenders.isEmpty,
      "unrounded order-sensitive double aggregates in registry output (violates SURVEY §5):\n  " +
        offenders.mkString("\n  "))
  }
}
