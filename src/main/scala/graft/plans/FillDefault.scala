package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RuntimeReplaceable, UnaryExpression}

/** `graft_fill_default(col)` → the TYPE DEFAULT of `col`'s type,
  * resolved at analysis (RuntimeReplaceable → `Literal.default`):
  * 0 for numerics, '' for strings, 1970-01-01 for dates — exactly the
  * values ClickHouse manufactures for non-interpolated columns on
  * WITH FILL rows (and for LEFT ARRAY JOIN defaults). The WITH FILL
  * rewrite is textual and cannot know column types at parse; before
  * round 17 it emitted a literal `0`, which silently COERCED string
  * columns to bigint (a runtime cast crash on any fill query with a
  * string passenger column, e.g. the ClickHouse docs' own multi-key
  * d1/d2 example with its 'original' marker column).
  */
case class FillDefault(child: Expression) extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = Literal.default(child.dataType)
  override def prettyName: String = "graft_fill_default"
  override protected def withNewChildInternal(newChild: Expression): FillDefault =
    copy(child = newChild)
}
