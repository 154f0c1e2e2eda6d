package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_pg_text_array(s)` → array<string>: parse the Postgres array
  * text-literal syntax (PG docs §8.15.2): elements comma-separated
  * inside `{}`; an element is double-quoted when it contains braces,
  * commas, quotes, backslashes or whitespace (backslash escapes `\"`
  * and `\\` inside quotes); an UNQUOTED `NULL` (any case) is a null
  * element; `{}` is the empty array. Malformed input fails loudly —
  * a silently-dropped element in a replication pipeline is data
  * loss. */
case class PgTextArray(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_pg_text_array requires a string argument, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_pg_text_array"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.trim
    def bad(why: String) =
      throw new IllegalArgumentException(s"graft_pg_text_array: $why in <$s>")
    if (s.length < 2 || s.head != '{' || s.last != '}') bad("missing {braces}")
    val body = s.substring(1, s.length - 1)
    if (body.trim.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i <= body.length) {
      // one element per loop pass; i sits at its first char
      val sb = new StringBuilder
      var quoted = false
      if (i < body.length && body(i) == '"') {
        quoted = true
        i += 1
        var closed = false
        while (i < body.length && !closed) {
          body(i) match {
            case '\\' =>
              if (i + 1 >= body.length) bad("dangling backslash")
              sb += body(i + 1); i += 2
            case '"' => closed = true; i += 1
            case c => sb += c; i += 1
          }
        }
        if (!closed) bad("unterminated quote")
        // only delimiter or end may follow a closing quote
        if (i < body.length && body(i) != ',') bad("garbage after closing quote")
      } else {
        while (i < body.length && body(i) != ',') {
          if (body(i) == '"' || body(i) == '{' || body(i) == '}') bad("unquoted special character")
          sb += body(i); i += 1
        }
      }
      val raw = sb.toString
      if (quoted) out += UTF8String.fromString(raw)
      else {
        val t = raw.trim
        if (t.isEmpty) bad("empty unquoted element")
        else if (t.equalsIgnoreCase("NULL")) out += null
        else out += UTF8String.fromString(t)
      }
      if (i < body.length && body(i) == ',') {
        i += 1
        if (i >= body.length) bad("trailing delimiter")
      } else if (i >= body.length) {
        i = body.length + 1 // done
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): PgTextArray =
    copy(child = newChild)
}
