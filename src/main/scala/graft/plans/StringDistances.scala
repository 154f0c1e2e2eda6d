package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static string-distance kernels behind the ClickHouse similarity
  * long tail (jaroSimilarity, jaroWinklerSimilarity,
  * damerauLevenshteinDistance, byteHammingDistance, soundex). Plain
  * static methods so whole-stage codegen calls them directly — the
  * expressions below stay inside the codegen span, no UDF boundary.
  * Reference surface: the scanner prompt's "string similarity"
  * family (/root/reference/src/prompts/scanner.py:18-35).
  */
object StringDistanceKernels {

  /** Standard Jaro similarity over UTF-16 code units (matching the
    * common definition DuckDB's jaro_similarity implements, so the
    * oracle can hash-check it). Empty-vs-empty is 1, empty-vs-other 0. */
  def jaro(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // implementations (CH's C++, DuckDB's RapidFuzz) FLOOR the
    // half-transposition count via integer division — follow them,
    // not the textbook's fractional t/2, so oracles hash-match
    (m / la + m / lb + (m - transpositions / 2) / m) / 3.0
  }

  /** Jaro–Winkler with the standard 0.1 prefix scale, 4-char prefix
    * cap and 0.7 boost threshold (the canonical Winkler variant). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val j = jaro(ua, ub)
    if (j <= 0.7) return j
    val a = ua.toString; val b = ub.toString
    val max = math.min(4, math.min(a.length, b.length))
    var prefix = 0
    while (prefix < max && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau–Levenshtein (transpositions may be edited
    * further — the variant both ClickHouse and DuckDB implement, so
    * the oracle can hash-check it; distinct from OSA, e.g.
    * 'ca'→'abc' is 2 here, 3 under OSA). Full-matrix DP, guarded to
    * 16M cells so a pathological pair fails loudly instead of
    * allocating without bound. */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    require(la.toLong * lb <= 16000000L,
      s"damerauLevenshteinDistance: inputs too long ($la x $lb chars)")
    val maxDist = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    @inline def get(i: Int, j: Int) = d(i * w + j)
    @inline def set(i: Int, j: Int, v: Int): Unit = d(i * w + j) = v
    set(0, 0, maxDist)
    var i = 0
    while (i <= la) { set(i + 1, 0, maxDist); set(i + 1, 1, i); i += 1 }
    var j = 0
    while (j <= lb) { set(0, j + 1, maxDist); set(1, j + 1, j); j += 1 }
    val da = new java.util.HashMap[Char, Int]
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b.charAt(j - 1), 0)
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = get(i, j) + cost
        val ins = get(i + 1, j) + 1
        val del = get(i, j + 1) + 1
        val trans = get(k, l) + (i - k - 1) + 1 + (j - l - 1)
        set(i + 1, j + 1, math.min(math.min(sub, ins), math.min(del, trans)))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    get(la + 1, lb + 1).toLong
  }

  /** Byte-level Hamming: differing bytes over the common prefix plus
    * the full length difference (ClickHouse's unequal-length rule). */
  def byteHamming(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.getBytes; val b = ub.getBytes
    val common = math.min(a.length, b.length)
    var d = math.abs(a.length - b.length).toLong
    var i = 0
    while (i < common) {
      if (a(i) != b(i)) d += 1
      i += 1
    }
    d
  }

  private final val SoundexCode: Array[Char] = {
    val m = new Array[Char](26)
    java.util.Arrays.fill(m, '0')
    for (c <- "BFPV") m(c - 'A') = '1'
    for (c <- "CGJKQSXZ") m(c - 'A') = '2'
    for (c <- "DT") m(c - 'A') = '3'
    m('L' - 'A') = '4'
    for (c <- "MN") m(c - 'A') = '5'
    m('R' - 'A') = '6'
    m
  }

  /** American Soundex, 4-char code; H/W are transparent between
    * same-coded consonants, vowels reset the run. Non-alpha input
    * yields an empty code (matching ClickHouse's behavior of skipping
    * non-alphabetic leading characters). */
  def soundex(ua: UTF8String): UTF8String = {
    val s = ua.toString.toUpperCase(java.util.Locale.ROOT)
    var i = 0
    while (i < s.length && (s.charAt(i) < 'A' || s.charAt(i) > 'Z')) i += 1
    if (i >= s.length) return UTF8String.fromString("")
    val sb = new java.lang.StringBuilder(4)
    val first = s.charAt(i)
    sb.append(first)
    var lastCode = SoundexCode(first - 'A')
    i += 1
    while (i < s.length && sb.length < 4) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') {
        if (c == 'H' || c == 'W') {
          // transparent: keep lastCode as-is
        } else {
          val code = SoundexCode(c - 'A')
          if (code == '0') lastCode = '0' // vowel resets the run
          else {
            if (code != lastCode) sb.append(code)
            lastCode = code
          }
        }
      }
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    UTF8String.fromString(sb.toString)
  }
}

case class JaroSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaroSimilarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceKernels.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.StringDistanceKernels.jaro($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaroWinklerSimilarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.StringDistanceKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerauLevenshteinDistance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceKernels.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.StringDistanceKernels.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

case class ByteHammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "byteHammingDistance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceKernels.byteHamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.StringDistanceKernels.byteHamming($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ByteHammingDistance =
    copy(left = l, right = r)
}

case class SoundexExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "soundex"
  override protected def nullSafeEval(input: Any): Any =
    StringDistanceKernels.soundex(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StringDistanceKernels.soundex($c)")
  override protected def withNewChildInternal(c: Expression): SoundexExpr = copy(child = c)
}
