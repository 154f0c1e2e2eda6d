package org.apache.spark.sql

/** Test-only bridge: lift a catalyst Expression into a Column so a
  * spec can differentially evaluate an expression formulation that is
  * no longer reachable from SQL (ExpressionUtils is private[sql]). */
object GraftTestColumns {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
