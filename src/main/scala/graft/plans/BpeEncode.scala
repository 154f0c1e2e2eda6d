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
