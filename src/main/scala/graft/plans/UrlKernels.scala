package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass URLHierarchy / URLPathHierarchy kernel.
  *
  * The former formulation built, per row, a `Sequence(0, len)` index
  * array, `Slice`d it, `ArrayFilter`ed it with a lambda calling
  * `Substring(tail, i, 1)` at every position (each a codepoint-seeking
  * scan — O(len) per call, O(len²) per row on non-ASCII), then
  * `ArrayTransform`ed the survivors into one `Substring`+`Concat` per
  * level. This expression walks the UTF-8 bytes exactly once and
  * slices levels out of the original byte buffer (the ASCII
  * separators `/ ? #` can never occur inside a multi-byte UTF-8
  * sequence, so byte positions are safe cut points and the emitted
  * strings are byte-identical to the codepoint formulation's).
  *
  * Interpreted eval (CodegenFallback) is deliberate, same rationale
  * as [[TextHashes]]: one dispatch per row against a whole-URL byte
  * walk; the win over the codegen'd-but-quadratic expression forest
  * is the pass structure, not dispatch. Semantics are pinned
  * differentially against the old expression tree by
  * Round20UrlFuzzSpec (doc shapes, separator runs, userinfo, bare
  * hosts, multibyte text, empties).
  *
  * Rule replicated bit for bit (ChDialect's documented CH shape):
  * the URL is truncated after each RUN of `/` `?` separators past the
  * authority (consecutive separators collapse — the cut lands after
  * all of them), the full URL is appended when it doesn't end in a
  * separator; `pathOnly` drops the scheme+authority prefix and the
  * bare `/` root element. The authority ends at the first of
  * `/ ? #`; `#` ends the authority but never a hierarchy level.
  */
case class UrlHierarchy(child: Expression, pathOnly: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING url, got ${child.dataType.catalogString}")
  override def prettyName: String = if (pathOnly) "URLPathHierarchy" else "URLHierarchy"

  @inline private def isSep(b: Byte): Boolean = b == '/' || b == '?'

  override protected def nullSafeEval(input: Any): Any = {
    val url = input.asInstanceOf[UTF8String]
    val u = url.getBytes
    val n = u.length
    // scheme prefix: bytes up to and including the first "://"
    var prefix = 0
    var i = 0
    while (prefix == 0 && i + 2 < n) {
      if (u(i) == ':' && u(i + 1) == '/' && u(i + 2) == '/') prefix = i + 3
      i += 1
    }
    // authority ends at the first of / ? # at or past the prefix
    var fs = n
    i = prefix
    while (fs == n && i < n) {
      val c = u(i)
      if (c == '/' || c == '?' || c == '#') fs = i
      i += 1
    }
    if (fs >= n) { // empty tail
      return if (pathOnly) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](url))
    }
    def slice(from: Int, until: Int): UTF8String =
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(u, from, until))
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    // positions ending a separator run inside the tail
    var j = fs
    while (j < n) {
      if (isSep(u(j)) && (j == n - 1 || !isSep(u(j + 1)))) {
        val level = if (pathOnly) slice(fs, j + 1) else slice(0, j + 1)
        // pathOnly drops the bare "/" root level
        if (!(pathOnly && j == fs && u(j) == '/')) out += level
      }
      j += 1
    }
    if (!isSep(u(n - 1)))
      out += (if (pathOnly) slice(fs, n) else url)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlHierarchy =
    copy(child = newChild)
}
