package graft

import java.time.LocalDate
import scala.util.Random

/** Round 18 — differential fuzz of the CH scalar dialect, following
  * Round17FillFuzzSpec's model-based pattern: random well-typed inputs
  * (fixed seeds — failures reproduce) are pushed through the
  * REGISTERED ClickHouse spellings via spark.sql and compared against
  * independent Scala reference models (java.time / BigInt / codepoint
  * arithmetic) plus algebraic laws where a model would just duplicate
  * the kernel (division identity, encode∘decode = id, gcd divides).
  *
  * This hunts the q95h class systematically: a scalar that parses and
  * runs but never meets exercising data in its q28* gate (negative
  * operands, multi-byte codepoints, boundary shifts, dates far from
  * the fixtures' 1995/2024 clusters) gets 200+ randomized probes here.
  * Cases are batched — one SELECT with many aliased columns per family
  * — so the suite cost stays in seconds.
  */
class Round18DialectFuzzSpec extends SparkSpec {

  /** One batched differential: (sql, expected, abs tolerance). */
  private case class Case(sql: String, want: Any, tol: Double = 0.0)

  private def runBatch(cases: Seq[Case], family: String): Unit = {
    val select = cases.zipWithIndex
      .map { case (c, i) => s"${c.sql} AS c$i" }.mkString(", ")
    val row = spark.sql(s"SELECT $select").head()
    cases.zipWithIndex.foreach { case (c, i) =>
      val got = row.get(i)
      val ok = (got, c.want) match {
        case (null, null) => true
        case (g: Number, w: Number) =>
          math.abs(g.doubleValue - w.doubleValue) <=
            c.tol + 1e-9 * math.max(1.0, math.abs(w.doubleValue))
        // Spark hands back mutable.ArraySeq, which bare `Seq` (=
        // immutable.Seq in 2.13) does NOT match — use collection.Seq
        case (g: scala.collection.Seq[_], w: scala.collection.Seq[_]) =>
          g.iterator.map(String.valueOf(_)).toList == w.iterator.map(String.valueOf(_)).toList
        case (g, w) => String.valueOf(g) == String.valueOf(w)
      }
      assert(ok, s"$family case $i: `${c.sql}` → $got, expected ${c.want}")
    }
  }

  test("fuzz: integer/bit kernels vs BigInt models and the division identity") {
    val rnd = new Random(180001)
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 25) {
      val a = rnd.nextLong() % 1000000007L
      val b = { val x = rnd.nextLong() % 99991L; if (x == 0) 7L else x }
      // division identity holds under any consistent rounding convention
      cases += Case(s"intDiv(${a}L, ${b}L) * ${b}L + modulo(${a}L, ${b}L)", a)
      cases += Case(s"intDivOrZero(${a}L, 0L)", 0L)
      cases += Case(s"moduloOrZero(${a}L, 0L)", 0L)
      val g = BigInt(a).gcd(BigInt(b)).toLong
      cases += Case(s"gcd(${a}L, ${b}L)", g)
      cases += Case(s"bitAnd(${a}L, ${b}L)", a & b)
      cases += Case(s"bitOr(${a}L, ${b}L)", a | b)
      cases += Case(s"bitXor(${a}L, ${b}L)", a ^ b)
      val sh = rnd.nextInt(48) + 1
      val pos = math.abs(a % 65536L)
      cases += Case(s"bitShiftLeft(${pos}L, $sh)", pos << sh)
      cases += Case(s"bitShiftRight(${pos << 12}L, $sh)", (pos << 12) >> sh)
      cases += Case(s"bitRotateLeft(${a}L, $sh)", java.lang.Long.rotateLeft(a, sh))
      cases += Case(s"byteSwap(${a}L)", java.lang.Long.reverseBytes(a))
      val p = math.abs(a % 1000000L) + 1
      cases += Case(s"roundToExp2(${p}L)", java.lang.Long.highestOneBit(p))
      val lo = rnd.nextInt(50); val hi = lo + rnd.nextInt(50)
      val x = rnd.nextInt(150) - 25
      cases += Case(s"clamp($x, $lo, $hi)", math.max(lo, math.min(hi, x)))
      val h = (rnd.nextInt(2000) - 1000) / 2.0 // exact .5 boundaries included
      cases += Case(s"roundBankers(${h}D)", math.rint(h))
    }
    // lcm via gcd on small positives (overflow-free domain)
    for (_ <- 0 until 10) {
      val a = rnd.nextInt(10000) + 1; val b = rnd.nextInt(10000) + 1
      val g = BigInt(a).gcd(BigInt(b)).toLong
      cases += Case(s"lcm($a, $b)", a.toLong / g * b.toLong)
    }
    runBatch(cases.result(), "intbit")
  }

  test("fuzz: date kernels vs java.time on dates far from the fixture clusters") {
    val rnd = new Random(180002)
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 40) {
      // 1930..2105 — far outside the 1995/2024 fixture data
      val d = LocalDate.ofEpochDay(rnd.nextInt(64000) - 14600)
      val lit = s"DATE '${d}'"
      cases += Case(s"CAST(toStartOfMonth($lit) AS DATE)", java.sql.Date.valueOf(d.withDayOfMonth(1)))
      cases += Case(s"CAST(toLastDayOfMonth($lit) AS DATE)",
        java.sql.Date.valueOf(d.withDayOfMonth(d.lengthOfMonth)))
      cases += Case(s"CAST(toMonday($lit) AS DATE)", java.sql.Date.valueOf(
        d.`with`(java.time.temporal.TemporalAdjusters.previousOrSame(java.time.DayOfWeek.MONDAY))))
      cases += Case(s"toDayOfWeek($lit)", d.getDayOfWeek.getValue.toLong) // ISO: Mon=1
      cases += Case(s"toDayOfYear($lit)", d.getDayOfYear.toLong)
      cases += Case(s"toYYYYMM($lit)", d.getYear.toLong * 100 + d.getMonthValue)
      cases += Case(s"toYYYYMMDD($lit)",
        d.getYear.toLong * 10000 + d.getMonthValue * 100 + d.getDayOfMonth)
      val k = rnd.nextInt(48) - 24
      cases += Case(s"CAST(addMonths($lit, $k) AS DATE)", java.sql.Date.valueOf(d.plusMonths(k)))
      cases += Case(s"CAST(addDays($lit, ${k * 7}) AS DATE)", java.sql.Date.valueOf(d.plusDays(k * 7)))
      cases += Case(s"CAST(toStartOfQuarter($lit) AS DATE)", java.sql.Date.valueOf(
        d.withDayOfMonth(1).withMonth((d.getMonthValue - 1) / 3 * 3 + 1)))
      cases += Case(s"CAST(toStartOfYear($lit) AS DATE)", java.sql.Date.valueOf(d.withDayOfMonth(1).withMonth(1)))
      cases += Case(s"formatDateTime($lit, '%Y-%m-%d')", d.toString)
    }
    // DateTime pieces in the session's UTC zone
    for (_ <- 0 until 15) {
      val epoch = math.abs(rnd.nextLong() % 4102444800L) // 1970..2100
      val dt = java.time.LocalDateTime.ofEpochSecond(epoch, 0, java.time.ZoneOffset.UTC)
      val lit = s"to_timestamp($epoch)"
      cases += Case(s"toHour($lit)", dt.getHour.toLong)
      cases += Case(s"toMinute($lit)", dt.getMinute.toLong)
      cases += Case(s"toSecond($lit)", dt.getSecond.toLong)
      cases += Case(s"toUnixTimestamp($lit)", epoch)
    }
    runBatch(cases.result(), "date")
  }

  test("fuzz: UTF8 string kernels vs codepoint models; encode/decode identities") {
    val rnd = new Random(180003)
    // BMP alphabet without combining marks: ASCII + Greek + CJK + emoji-free
    val alphabet = "abcXYZ09 _-αβγδЖЩ漢字測試ñü€"
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def lit(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 30) {
      val s = randStr(rnd.nextInt(12) + 1)
      val cps = s.codePoints.toArray
      cases += Case(s"lengthUTF8(${lit(s)})", cps.length.toLong)
      cases += Case(s"reverseUTF8(${lit(s)})",
        cps.reverse.map(cp => new String(Character.toChars(cp))).mkString)
      val pos = rnd.nextInt(cps.length) + 1
      val len = rnd.nextInt(cps.length - pos + 2)
      cases += Case(s"substringUTF8(${lit(s)}, $pos, $len)",
        cps.slice(pos - 1, pos - 1 + len).map(cp => new String(Character.toChars(cp))).mkString)
      val w = cps.length + rnd.nextInt(6)
      cases += Case(s"leftPad(${lit(s)}, $w, '*')", "*" * (w - cps.length) + s)
      cases += Case(s"rightPad(${lit(s)}, $w, '*')", s + "*" * (w - cps.length))
      val r = rnd.nextInt(4)
      cases += Case(s"repeat(${lit(s)}, $r)", s * r)
      cases += Case(s"base64Decode(base64Encode(${lit(s)}))", s)
      cases += Case(s"startsWith(${lit(s)}, ${lit(s.substring(0, 1))})",
        s.startsWith(s.substring(0, 1)))
    }
    for (_ <- 0 until 15) {
      // ASCII-only domain for position/count kernels (byte == codepoint)
      val hay = (0 until rnd.nextInt(20) + 4).map(_ => "ab!c"(rnd.nextInt(4))).mkString
      val needle = if (rnd.nextBoolean()) "ab" else "c"
      def countNonOverlap(h: String, n: String): Long = {
        var (i, c) = (h.indexOf(n), 0L)
        while (i >= 0) { c += 1; i = h.indexOf(n, i + n.length) }
        c
      }
      cases += Case(s"countSubstrings(${lit(hay)}, ${lit(needle)})", countNonOverlap(hay, needle))
      cases += Case(s"position(${lit(hay)}, ${lit(needle)})", (hay.indexOf(needle) + 1).toLong)
      cases += Case(s"positionCaseInsensitive(${lit(hay.toUpperCase)}, ${lit(needle)})",
        (hay.toUpperCase.toLowerCase.indexOf(needle) + 1).toLong)
    }
    runBatch(cases.result(), "string")
  }

  test("fuzz: array kernels vs sequence models") {
    val rnd = new Random(180004)
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 25) {
      val xs = Seq.fill(rnd.nextInt(8) + 1)(rnd.nextInt(21) - 10)
      val arr = s"array(${xs.mkString(", ")})"
      cases += Case(s"arraySum($arr)", xs.map(_.toLong).sum)
      cases += Case(s"arrayMin($arr)", xs.min)
      cases += Case(s"arrayMax($arr)", xs.max)
      cases += Case(s"arrayAvg($arr)", xs.sum.toDouble / xs.size, tol = 1e-9)
      cases += Case(s"arrayCumSum($arr)", xs.scanLeft(0L)(_ + _).tail)
      cases += Case(s"arrayDifference($arr)",
        xs.indices.map(i => if (i == 0) 0L else (xs(i) - xs(i - 1)).toLong))
      cases += Case(s"arrayDistinct($arr)", xs.distinct)
      cases += Case(s"arrayCompact($arr)",
        xs.foldLeft(Vector.empty[Int])((acc, v) => if (acc.lastOption.contains(v)) acc else acc :+ v))
      cases += Case(s"arrayReverse($arr)", xs.reverse)
      val off = rnd.nextInt(xs.size) + 1
      val ln = rnd.nextInt(xs.size - off + 2)
      cases += Case(s"arraySlice($arr, $off, $ln)", xs.slice(off - 1, off - 1 + ln))
      val probe = xs(rnd.nextInt(xs.size))
      cases += Case(s"has($arr, $probe)", true)
      cases += Case(s"indexOf($arr, $probe)", (xs.indexOf(probe) + 1).toLong)
      cases += Case(s"countEqual($arr, $probe)", xs.count(_ == probe).toLong)
      cases += Case(s"arrayStringConcat(arrayMap(x -> toString(x), $arr), '-')",
        xs.mkString("-"))
    }
    runBatch(cases.result(), "array")
  }

  test("fuzz: conversions and IP kernels — OrNull/OrZero branches and roundtrips") {
    val rnd = new Random(180005)
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 15) {
      val n = rnd.nextInt()
      cases += Case(s"toInt32OrNull('${n}')", n)
      cases += Case(s"toInt32OrZero('${n}')", n)
      val junk = "x" + rnd.nextInt(100)
      cases += Case(s"toInt32OrNull('$junk')", null)
      cases += Case(s"toInt32OrZero('$junk')", 0)
      cases += Case(s"toFloat64OrNull('${n}.5')", n + (if (n < 0) -0.5 else 0.5), tol = 1e-9)
      val ip = rnd.nextInt() & 0xFFFFFFFFL
      val dotted = s"${ip >> 24 & 255}.${ip >> 16 & 255}.${ip >> 8 & 255}.${ip & 255}"
      cases += Case(s"IPv4NumToString(${ip}L)", dotted)
      cases += Case(s"IPv4StringToNum('$dotted')", ip)
      cases += Case(s"IPv4StringToNum(IPv4NumToString(${ip}L))", ip)
    }
    runBatch(cases.result(), "conv")
  }

  test("fuzz: URL kernels vs structured random URLs") {
    val rnd = new Random(180006)
    val labels = Seq("api", "cdn", "shop", "eu1", "data", "x9")
    val tlds = Seq("com", "org", "net", "io")
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 20) {
      val sub = labels(rnd.nextInt(labels.length))
      val dom = "ex" + rnd.nextInt(100)
      val tld = tlds(rnd.nextInt(tlds.length))
      val host = s"$sub.$dom.$tld"
      val proto = if (rnd.nextBoolean()) "https" else "http"
      val segs = Seq.fill(rnd.nextInt(3) + 1)("p" + rnd.nextInt(50))
      val p = "/" + segs.mkString("/")
      val k = "k" + rnd.nextInt(9); val v = "v" + rnd.nextInt(99)
      val qs = s"$k=$v&z=1"
      val frag = "frag" + rnd.nextInt(9)
      val url = s"$proto://$host$p?$qs#$frag"
      cases += Case(s"protocol('$url')", proto)
      cases += Case(s"domain('$url')", host)
      cases += Case(s"topLevelDomain('$url')", tld)
      cases += Case(s"path('$url')", p)
      cases += Case(s"pathFull('$url')", s"$p?$qs")
      cases += Case(s"queryString('$url')", qs)
      cases += Case(s"extractURLParameter('$url', '$k')", v)
      // CH keeps the fragment (cutQueryStringAndFragment drops both)
      cases += Case(s"cutQueryString('$url')", s"$proto://$host$p#$frag")
      cases += Case(s"cutQueryStringAndFragment('$url')", s"$proto://$host$p")
      // firstSignificantSubdomain on plain public TLDs = the
      // second-to-last label
      cases += Case(s"firstSignificantSubdomain('$url')", dom)
      cases += Case(s"cutWWW('$proto://www.$dom.$tld$p')", s"$proto://$dom.$tld$p")
      val s = "a b" + rnd.nextInt(100) + "&c=d"
      cases += Case(s"decodeURLComponent(encodeURLComponent('$s'))", s)
    }
    runBatch(cases.result(), "url")
  }

  test("fuzz: JSON kernels over generated flat documents") {
    val rnd = new Random(180007)
    val cases = Seq.newBuilder[Case]
    for (_ <- 0 until 18) {
      val a = rnd.nextInt(100000) - 50000
      val bv = "s" + rnd.nextInt(1000)
      val c = rnd.nextBoolean()
      val arr = Seq.fill(rnd.nextInt(4) + 1)(rnd.nextInt(100))
      val j = s"""{"a": $a, "b": "$bv", "c": $c, "d": [${arr.mkString(",")}]}"""
      val lit = "'" + j + "'"
      cases += Case(s"JSONExtractInt($lit, 'a')", a.toLong)
      cases += Case(s"JSONExtractString($lit, 'b')", bv)
      cases += Case(s"JSONExtractBool($lit, 'c')", c)
      cases += Case(s"JSONHas($lit, 'a')", true)
      cases += Case(s"JSONHas($lit, 'zz')", false)
      cases += Case(s"JSONLength($lit, 'd')", arr.length.toLong)
      cases += Case(s"arrayStringConcat(JSONExtractKeys($lit), ',')", "a,b,c,d")
      cases += Case(s"simpleJSONExtractInt($lit, 'a')", a.toLong)
      cases += Case(s"visitParamExtractInt($lit, 'a')", a.toLong)
    }
    runBatch(cases.result(), "json")
  }

  test("fuzz: format/trim/split kernels vs ladder models and roundtrips") {
    val rnd = new Random(180008)
    val cases = Seq.newBuilder[Case]
    def readable(v: Double, base: Double, units: Seq[String]): String = {
      var (x, i) = (v, 0)
      while (x >= base && i < units.length - 1) { x /= base; i += 1 }
      f"$x%.2f ${units(i)}"
    }
    for (_ <- 0 until 15) {
      val n = (math.abs(rnd.nextLong()) % 1000000000000L) + 1
      cases += Case(s"formatReadableSize(${n}L)",
        readable(n.toDouble, 1024, Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")))
      cases += Case(s"formatReadableDecimalSize(${n}L)",
        readable(n.toDouble, 1000, Seq("B", "KB", "MB", "GB", "TB", "PB", "EB")))
      cases += Case(s"formatReadableQuantity(${n}L)",
        readable(n.toDouble, 1000, Seq("", "thousand", "million", "billion", "trillion")).trim)
      val body = "w" + rnd.nextInt(1000)
      val padded = "  " + body + "   "
      cases += Case(s"trimLeft('$padded')", body + "   ")
      cases += Case(s"trimRight('$padded')", "  " + body)
      cases += Case(s"trimBoth('$padded')", body)
      cases += Case(s"appendTrailingCharIfAbsent('$body', '/')", body + "/")
      cases += Case(s"appendTrailingCharIfAbsent('$body/', '/')", body + "/")
      // split∘join identity holds for ANY string and separator
      val parts = Seq.fill(rnd.nextInt(4) + 1)("t" + rnd.nextInt(50))
      val joined = parts.mkString("--")
      cases += Case(s"arrayStringConcat(splitByString('--', '$joined'), '--')", joined)
      cases += Case(s"tupleElement(tuple(${rnd.nextInt(100)}, 'x'), 1)",
        null) // placeholder replaced below
      cases.result() // force nothing; keep builder usable
    }
    // tupleElement deterministic probes (values must match the model)
    val cs = cases.result().filterNot(_.sql.startsWith("tupleElement"))
    val withTuples = cs ++ (0 until 5).map { i =>
      Case(s"tupleElement(tuple(${i * 7}, 'x'), 1)", i * 7)
    }
    runBatch(withTuples, "format")
  }
}
