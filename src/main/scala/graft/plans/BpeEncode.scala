package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE APPLY — the tokenizer hot path a training pipeline runs over
  * the whole corpus (the trainer,
  * [[graft.operators.TextAnalysis.bpeTrain]], runs once; this runs on
  * every document forever after). Standard greedy merge application
  * (Sennrich et al. 2016): per word, repeatedly merge the
  * lowest-ranked adjacent pair until none ranks.
  *
  * 100 TB shape: map-only — no shuffle, no state beyond the merge
  * table. The ranked merge list rides the plan as ONE string literal
  * (`"a b\nc d\n…"`, rank = line number), parsed once per JVM into a
  * rank map keyed by that string; encoded words memoize in a bounded
  * per-table cache (natural-language corpora repeat words — the
  * cache turns the per-word loop into a lookup for the bulk of
  * tokens). Static-call codegen keeps the expression inside
  * whole-stage codegen like the hash kernels.
  */
object BpeFns {

  final class Table(val ranks: java.util.HashMap[String, Integer]) {
    val wordCache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  }

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Table]()
  private final val MaxCachedWords = 200000

  def table(merges: String): Table = tables.computeIfAbsent(merges, m => {
    val ranks = new java.util.HashMap[String, Integer]()
    var rank = 0
    m.split('\n').foreach { line =>
      val t = line.trim
      if (t.nonEmpty) { ranks.put(t, rank); rank += 1 }
    }
    new Table(ranks)
  })

  def encodeWord(word: String, t: Table): Array[String] = {
    val cached = t.wordCache.get(word)
    if (cached != null) return cached
    // char split — the symbol alphabet bpeTrain starts from
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = t.ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, bestAt)
        next(bestAt) = syms(bestAt) + syms(bestAt + 1)
        System.arraycopy(syms, bestAt + 2, next, bestAt + 1, syms.length - bestAt - 2)
        syms = next
        done = syms.length <= 1
      }
    }
    if (t.wordCache.size < MaxCachedWords) t.wordCache.put(word, syms)
    syms
  }

  /** `text` is whitespace-separated words (the caller normalizes the
    * same way the trainer did); returns the flat subword sequence. */
  def encode(text: UTF8String, merges: UTF8String): GenericArrayData = {
    val t = table(merges.toString)
    val out = new java.util.ArrayList[Any]()
    val words = text.toString.split(' ')
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val toks = encodeWord(words(i), t)
        var k = 0
        while (k < toks.length) { out.add(UTF8String.fromString(toks(k))); k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ------------------------------------------------------------------
  // Byte-level BPE (the GPT-2 public spec: Radford et al. 2019 §2.2):
  // UTF-8 bytes are the base alphabet, each byte rendered as one
  // printable unicode char so merges/vocab stay plain strings, and a
  // regex pre-tokenizer bounds merges (no merge crosses a pre-token).
  // Byte-level means EVERY string round-trips: decode(encode(x)) == x
  // with no unknown-token escape hatch — what a production tokenizer
  // (and so the LLM-cost estimate q64 feeds) actually guarantees.

  /** GPT-2 byte→printable-char table: bytes that are already printable
    * (33–126, 161–172, 174–255) map to themselves; the rest take
    * codepoints 256+n in first-gap order (so 0x20 ' ' → U+0120 'Ġ'). */
  val byteToChar: Array[Char] = {
    val m = new Array[Char](256)
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) m(b) = b.toChar
      else { m(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    m
  }

  // -1 marks codepoints OUTSIDE the byte-char alphabet (raw space,
  // unmapped printables, anything ≥ 0x144): decode must reject them
  // loudly, not index out of bounds or silently emit 0x00
  private val charToByte: Array[Short] = {
    val m = Array.fill[Short](324)(-1) // max mapped codepoint is 0x143
    var b = 0
    while (b < 256) { m(byteToChar(b)) = b.toShort; b += 1 }
    m
  }

  /** The GPT-2 pre-tokenizer (public spec). `\s+(?!\S)` keeps the last
    * space of a run attached to the following word (as its ` ?`
    * prefix); UNICODE_CHARACTER_CLASS makes `\s` match unicode
    * whitespace like Python's `regex` module does. */
  val gpt2Pretokenizer: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** One pre-token → its byte-mapped symbol string. */
  def mapPretoken(pt: String): String = {
    val bytes = pt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { chars(i) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(chars)
  }

  private def pretokenList(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = gpt2Pretokenizer.matcher(text)
    while (m.find()) out.add(mapPretoken(m.group()))
    out
  }

  /** Raw text → byte-mapped pre-tokens (the trainer's word universe). */
  def bytePretokens(text: UTF8String): GenericArrayData = {
    val pts = pretokenList(text.toString)
    val out = new Array[Any](pts.size)
    var i = 0
    while (i < pts.size) { out(i) = UTF8String.fromString(pts.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Byte-level BPE APPLY over raw text: GPT-2 pre-tokenize, map each
    * pre-token to byte-chars, then the same greedy lowest-rank merge
    * loop (and per-table word memo) the word-level encoder uses. */
  def encodeBytes(text: UTF8String, merges: UTF8String): GenericArrayData = {
    val t = table(merges.toString)
    val out = new java.util.ArrayList[Any]()
    val pts = pretokenList(text.toString)
    var i = 0
    while (i < pts.size) {
      val toks = encodeWord(pts.get(i), t)
      var k = 0
      while (k < toks.length) { out.add(UTF8String.fromString(toks(k))); k += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Inverse of [[encodeBytes]]: concatenate token chars, map each back
    * to its byte, UTF-8 decode — the byte-level round-trip identity. */
  def decodeBytes(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < tokens.numElements()) { sb.append(tokens.getUTF8String(i).toString); i += 1 }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      val b = if (c < 324) charToByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        f"graft_bpe_byte_decode: token char U+${c.toInt}%04X is outside the " +
          "byte-level alphabet — input must be graft_bpe_byte_encode output")
      bytes(k) = b.toByte
      k += 1
    }
    UTF8String.fromString(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }
}

case class BpeEncodeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"
  override protected def nullSafeEval(text: Any, merges: Any): Any =
    BpeFns.encode(text.asInstanceOf[UTF8String], merges.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.plans.BpeFns.encode($t, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncodeExpr =
    copy(left = l, right = r)
}

/** Raw text → GPT-2 byte-mapped pre-tokens (byte-level trainer input). */
case class BpeBytePretokensExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_byte_pretokens"
  override protected def nullSafeEval(text: Any): Any =
    BpeFns.bytePretokens(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.BpeFns.bytePretokens($t)")
  override protected def withNewChildInternal(c: Expression): BpeBytePretokensExpr =
    copy(child = c)
}

/** Byte-level BPE tokenizer hot path — map-only like the word form. */
case class BpeByteEncodeExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_byte_encode"
  override protected def nullSafeEval(text: Any, merges: Any): Any =
    BpeFns.encodeBytes(text.asInstanceOf[UTF8String], merges.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.plans.BpeFns.encodeBytes($t, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeByteEncodeExpr =
    copy(left = l, right = r)
}

/** Byte-level BPE detokenizer: the round-trip identity's other half. */
case class BpeByteDecodeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_byte_decode"
  override protected def nullSafeEval(tokens: Any): Any =
    BpeFns.decodeBytes(tokens.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.BpeFns.decodeBytes($t)")
  override protected def withNewChildInternal(c: Expression): BpeByteDecodeExpr =
    copy(child = c)
}
