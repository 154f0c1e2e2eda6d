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
  * and `\\` inside quotes); backslash also escapes in UNQUOTED
  * elements (`{a\"b}` is `a"b`), an escaped char survives
  * whitespace-trimming and disables NULL detection (`\N\U\L\L` is
  * the string "NULL"); whitespace around elements is skipped like
  * PG's array_in; an UNQUOTED bare `NULL` (any case) is a null
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
      // one element per loop pass; PG's array_in skips whitespace
      // around elements (quoted or not), so do the same
      while (i < body.length && body(i).isWhitespace) i += 1
      val sb = new StringBuilder
      var isNull = false
      if (i < body.length && body(i) == '"') {
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
        while (i < body.length && body(i).isWhitespace) i += 1
        // only delimiter or end may follow a closing quote
        if (i < body.length && body(i) != ',') bad("garbage after closing quote")
      } else {
        // PG treats backslash as an escape in UNQUOTED elements too
        // ('{a\"b}' is the two chars a"b); an escaped char is literal,
        // survives trailing-whitespace trimming, and disables NULL
        // detection (\N\U\L\L is the STRING "NULL")
        var escLen = 0 // prefix of sb that trimming must preserve
        var hadEscape = false
        while (i < body.length && body(i) != ',') {
          body(i) match {
            case '\\' =>
              if (i + 1 >= body.length) bad("dangling backslash")
              sb += body(i + 1); i += 2
              hadEscape = true; escLen = sb.length
            case '"' | '{' | '}' => bad("unquoted special character")
            case c => sb += c; i += 1
          }
        }
        // trim unescaped trailing whitespace (leading was skipped above)
        var end = sb.length
        while (end > escLen && sb(end - 1).isWhitespace) end -= 1
        sb.setLength(end)
        if (sb.isEmpty && !hadEscape) bad("empty unquoted element")
        isNull = !hadEscape && sb.toString.equalsIgnoreCase("NULL")
      }
      out += (if (isNull) null else UTF8String.fromString(sb.toString))
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
