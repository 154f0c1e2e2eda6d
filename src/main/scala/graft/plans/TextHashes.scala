package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-DOCUMENT text sketches: the whole MinHash signature
  * (or SimHash) of a document computed inside a single expression,
  * straight from the normalized text.
  *
  * Exists because the compositional formulation — explode word
  * shingles (interpreted higher-order functions, 30-80× row blowup),
  * shuffle the (doc, shingle) rows, then 64 aggregate buffers per
  * group — spends its time on interpretation overhead and on moving
  * exploded rows, not on hashing. Per document the sketch is a tight
  * loop over tokens: token hash → rolling n-gram chain hash → k
  * seed-mixes (MinHash) or 64 bit-counters (SimHash). This turns the
  * signature stage from explode + shuffle + wide agg into a pure
  * map — at 100 TB the shingle rows never exist and the only shuffle
  * left in LSH dedup is the band-bucket join.
  *
  * Interpreted eval (CodegenFallback) is deliberate: the expression
  * runs once per DOCUMENT (not per shingle), so per-row dispatch is
  * noise against the per-doc hashing work.
  *
  * Hash family: XXH64 over UTF-8 token bytes (seed 42); an n-gram
  * shingle hash is the seed-chained XXH64 of its n token hashes;
  * MinHash function i re-mixes the shingle hash with `XXH64.hashLong
  * (h, i)`. Tokens are maximal runs of non-space chars (empty runs
  * skipped). Fewer than n tokens → the whole token sequence is one
  * shingle; zero tokens → one sentinel shingle. Deterministic on any
  * JVM (XXH64 is part of the published xxHash spec).
  */
private[plans] object TextHashes {
  final val TokenSeed = 42L

  /** Hashes of all word n-gram shingles of `text` (distinctness NOT
    * enforced — MinHash min() and SimHash majority voting are the
    * consumers and tolerate duplicates by construction). */
  def shingleHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    // token hashes: maximal runs of non-space bytes
    var tokenHashes = new Array[Long](8)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val start = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > start) {
        if (nTok == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        }
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, TokenSeed)
        nTok += 1
      }
    }
    if (nTok == 0) return Array(XXH64.hashLong(0L, TokenSeed))
    if (nTok < n) {
      // whole document as one shingle (mirrors the short-doc rule of
      // the compositional shingler)
      var h = TokenSeed
      var j = 0
      while (j < nTok) { h = XXH64.hashLong(tokenHashes(j), h); j += 1 }
      return Array(h)
    }
    val out = new Array[Long](nTok - n + 1)
    var s = 0
    while (s <= nTok - n) {
      var h = TokenSeed
      var j = 0
      while (j < n) { h = XXH64.hashLong(tokenHashes(s + j), h); j += 1 }
      out(s) = h
      s += 1
    }
    out
  }

  def minHashSignature(text: UTF8String, n: Int, k: Int): Array[Long] = {
    val shingles = shingleHashes(text, n)
    val sig = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var i = 0
      while (i < k) {
        val m = XXH64.hashLong(h, i.toLong)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      s += 1
    }
    sig
  }

  def simHash64(text: UTF8String, n: Int): Long = {
    val shingles = shingleHashes(text, n)
    val ones = new Array[Int](64)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var i = 0
      while (i < 64) {
        ones(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      s += 1
    }
    val total = shingles.length
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (ones(i) * 2 > total) sim |= (1L << i)
      i += 1
    }
    sim
  }

  /** Hashes of all byte n-grams — CH's ngram* sketch family is
    * byte-level, unlike the word-shingle family above. Shorter-than-n
    * input is one gram; empty input one sentinel. */
  def byteGramHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    if (bytes.length == 0) return Array(XXH64.hashLong(0L, TokenSeed))
    if (bytes.length < n)
      return Array(XXH64.hashUnsafeBytes(bytes, off, bytes.length, TokenSeed))
    val out = new Array[Long](bytes.length - n + 1)
    var i = 0
    while (i <= bytes.length - n) {
      out(i) = XXH64.hashUnsafeBytes(bytes, off + i, n, TokenSeed)
      i += 1
    }
    out
  }

  /** CH minHash-tuple shape: fold-hash of the k smallest shingle
    * hashes and of the k largest — two stable digests that collide
    * for near-identical documents (either end surviving edits flags
    * the pair), the contract ngramMinHash/wordShingleMinHash serve. */
  def minHashTuple(hashes: Array[Long], k: Int): Array[Long] = {
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    val kk = math.min(k, sorted.length)
    var h1 = TokenSeed
    var h2 = TokenSeed
    var i = 0
    while (i < kk) {
      h1 = XXH64.hashLong(sorted(i), h1)
      h2 = XXH64.hashLong(sorted(sorted.length - 1 - i), h2)
      i += 1
    }
    Array(h1, h2)
  }

  /** Majority-vote 64-bit simhash of a shingle-hash set. */
  def simHashOf(shingles: Array[Long]): Long = {
    val ones = new Array[Int](64)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var i = 0
      while (i < 64) {
        ones(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      s += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (ones(i) * 2 > shingles.length) sim |= (1L << i)
      i += 1
    }
    sim
  }

  def requireFoldableInt(e: Expression, name: String): TypeCheckResult =
    if (!e.foldable || e.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
}

/** `graft_minhash_sig(text, nGram, numHashes)` → array<bigint>. */
case class MinHashSignature(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  import TextHashes._

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_minhash_sig requires a string column")
    else requireFoldableInt(second, "nGram") match {
      case TypeCheckResult.TypeCheckSuccess => requireFoldableInt(third, "numHashes")
      case fail => fail
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private lazy val n = second.eval().asInstanceOf[Int]
  private lazy val k = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, nv: Any, kv: Any): Any =
    new GenericArrayData(minHashSignature(text.asInstanceOf[UTF8String], n, k))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MinHashSignature = copy(f, s, t)
}

/** `graft_simhash64(text, nGram)` → bigint. */
case class SimHash64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import TextHashes._

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_simhash64 requires a string column")
    else requireFoldableInt(right, "nGram")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  private lazy val n = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, nv: Any): Any =
    simHash64(text.asInstanceOf[UTF8String], n)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SimHash64 = copy(l, r)
}

/** `graft_shingle_hashes(text, w)` → array<bigint>: the hash of every
  * w-word window of `text`, one per starting position, in one pass
  * (token XXH64s, then the seed-chained window hash per position) —
  * the map stage of exact-substring dedup ([[graft.operators.Dedup
  * .substringDedupStats]]). Replaces the compositional
  * transform(sequence(...), slice+concat_ws)+xxhash64 formulation,
  * which is interpreted (higher-order functions are CodegenFallback)
  * and materializes every window STRING before hashing — O(n·w)
  * string bytes per document that this expression never builds.
  * Same short/empty-document conventions as [[TextHashes
  * .shingleHashes]]; callers that need exactly the ≥w-token windows
  * filter short docs first, as substringDedupStats does. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import TextHashes._

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_shingle_hashes requires a string column")
    else requireFoldableInt(right, "w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  private lazy val n = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, nv: Any): Any =
    new GenericArrayData(shingleHashes(text.asInstanceOf[UTF8String], n))

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ShingleHashes = copy(l, r)
}

/** The ClickHouse scalar sketch spellings — `ngramMinHash` /
  * `wordShingleMinHash` (→ struct of two digests: fold of the k
  * smallest and k largest shingle hashes) and `ngramSimHash` /
  * `wordShingleSimHash` (→ bigint). `kind` picks byte-gram vs
  * word-shingle input; the sketch values are this engine's
  * deterministic XXH64 family, not a byte-level CH replay (the same
  * documented contract as the murmur/URLHash alias family). */
case class TextSketch(first: Expression, second: Expression, third: Expression, kind: String)
    extends TernaryExpression with CodegenFallback {
  import TextHashes._

  private def isMinHash = kind.endsWith("MinHash")
  private def isByteGram = kind.startsWith("ngram")

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$kind requires a string column")
    else requireFoldableInt(second, "gramSize") match {
      case TypeCheckResult.TypeCheckSuccess => requireFoldableInt(third, "hashNum")
      case fail => fail
    }
  }

  override def dataType: DataType =
    if (isMinHash)
      StructType(Seq(StructField("h1", LongType, nullable = false),
                     StructField("h2", LongType, nullable = false)))
    else LongType
  override def prettyName: String = kind

  private lazy val n = second.eval().asInstanceOf[Int]
  private lazy val k = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(text: Any, nv: Any, kv: Any): Any = {
    val t = text.asInstanceOf[UTF8String]
    val shingles = if (isByteGram) byteGramHashes(t, n) else shingleHashes(t, n)
    if (isMinHash) {
      val pair = minHashTuple(shingles, k)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](pair(0), pair(1)))
    } else simHashOf(shingles)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TextSketch = copy(f, s, t)
}
