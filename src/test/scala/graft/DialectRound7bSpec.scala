package graft

/** Second round-7 widening wave: string-distance tail, multi-search /
  * regex extraction, table functions, encodings, hash tail. Values a
  * SQL oracle can't pin are pinned here against published examples. */
class DialectRound7bSpec extends SparkSpec {

  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql AS v").head().getDouble(0)
  private def l(sql: String): Long =
    spark.sql(s"SELECT $sql AS v").head().getLong(0)
  private def s(sql: String): String =
    spark.sql(s"SELECT $sql AS v").head().getString(0)

  test("jaroSimilarity: textbook pairs and degenerate cases") {
    assert(math.abs(d("jaroSimilarity('MARTHA', 'MARHTA')") - 0.9444444444444445) < 1e-12)
    assert(math.abs(d("jaroSimilarity('DWAYNE', 'DUANE')") - 0.8222222222222223) < 1e-12)
    assert(d("jaroSimilarity('abc', 'abc')") == 1.0)
    assert(d("jaroSimilarity('', '')") == 1.0)
    assert(d("jaroSimilarity('abc', '')") == 0.0)
    assert(d("jaroSimilarity('abc', 'xyz')") == 0.0)
  }

  test("jaroWinklerSimilarity: prefix boost above the 0.7 threshold only") {
    assert(math.abs(d("jaroWinklerSimilarity('MARTHA', 'MARHTA')") - 0.9611111111111111) < 1e-12)
    // jaro('abc','xyz') = 0 <= 0.7 → no boost applied
    assert(d("jaroWinklerSimilarity('abc', 'xyz')") == 0.0)
    assert(d("jaroWinklerSimilarity('same', 'same')") == 1.0)
  }

  test("damerauLevenshteinDistance: unrestricted variant (matches CH and the oracle)") {
    assert(l("damerauLevenshteinDistance('ab', 'ba')") == 1L)
    assert(l("damerauLevenshteinDistance('ca', 'abc')") == 2L) // unrestricted, not OSA
    assert(l("damerauLevenshteinDistance('clickhouse', 'mouse')") == 6L)
    assert(l("damerauLevenshteinDistance('', 'abc')") == 3L)
    assert(l("damerauLevenshteinDistance('kitten', 'sitting')") == 3L)
  }

  test("byteHammingDistance: common prefix plus length difference") {
    assert(l("byteHammingDistance('karolin', 'kathrin')") == 3L)
    assert(l("byteHammingDistance('abc', 'ab')") == 1L)
    assert(l("byteHammingDistance('', 'xyz')") == 3L)
    assert(l("byteHammingDistance('same', 'same')") == 0L)
  }

  test("soundex: NARA reference codes incl. H-transparency and vowel reset") {
    assert(s("soundex('Robert')") == "R163")
    assert(s("soundex('Rupert')") == "R163")
    assert(s("soundex('Ashcraft')") == "A261")
    assert(s("soundex('Tymczak')") == "T522")
    assert(s("soundex('Pfister')") == "P236")
    assert(s("soundex('Honeyman')") == "H555")
    assert(s("soundex('123')") == "")
  }

  test("editDistanceUTF8 aliases the code-point levenshtein") {
    assert(spark.sql("SELECT editDistanceUTF8('flaw', 'lawn') AS v").head().getInt(0) == 2)
  }

  test("multiSearchFirstPosition/FirstIndex: leftmost occurrence wins, 0 when absent") {
    val r = spark.sql(
      """SELECT multiSearchFirstPosition('hello world', array('world', 'lo')) AS p,
                multiSearchFirstIndex('hello world', array('world', 'lo')) AS i,
                multiSearchFirstPosition('hello', array('x', 'y')) AS p0,
                multiSearchFirstIndex('hello', array('x', 'y')) AS i0,
                multiSearchFirstIndexCaseInsensitive('HELLO', array('zz', 'ell')) AS ci
      """).head()
    assert(r.getInt(0) == 4)   // 'lo' at 4 beats 'world' at 7
    assert(r.getLong(1) == 2L) // needle #2 ('lo') matched leftmost
    assert(r.getInt(2) == 0 && r.getLong(3) == 0L)
    assert(r.getLong(4) == 2L)
  }

  test("multiMatchAny/AnyIndex: regex needles, first matching pattern's index") {
    val r = spark.sql(
      """SELECT multiMatchAny('abc123', array('^xyz', '[0-9]+$')) AS any,
                multiMatchAnyIndex('abc123', array('^xyz', '[0-9]+$')) AS idx,
                multiMatchAny('abc', array('\\d')) AS no,
                multiMatchAnyIndex('abc', array('\\d')) AS noidx""").head()
    assert(r.getBoolean(0) && r.getLong(1) == 2L)
    assert(!r.getBoolean(2) && r.getLong(3) == 0L)
  }

  test("countMatchesCaseInsensitive and regexpExtract default group") {
    val r = spark.sql(
      """SELECT countMatchesCaseInsensitive('Aa aA xx', 'aa') AS c,
                regexpExtract('v=42;', 'v=([0-9]+)') AS g1,
                regexpExtract('v=42;', '(v)=([0-9]+)', 2) AS g2""").head()
    assert(r.getLong(0) == 2L)
    assert(r.getString(1) == "42" && r.getString(2) == "42")
  }

  test("extractAllGroupsHorizontal/Vertical over key=value pairs") {
    val r = spark.sql(
      """SELECT extractAllGroupsHorizontal('a=1,b=2', '(\\w)=(\\d)') AS h,
                extractAllGroupsVertical('a=1,b=2', '(\\w)=(\\d)') AS v""").head()
    assert(r.getSeq[Seq[String]](0) == Seq(Seq("a", "b"), Seq("1", "2")))
    assert(r.getSeq[Seq[String]](1) == Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("ngramSearch: needle-side containment ratio; CI variants") {
    assert(d("ngramSearch('abcdef', 'abcdef')") == 1.0)
    assert(d("ngramSearch('abcdef', 'zzzzz')") == 0.0)
    // 'abcde' grams {abcd,bcde} both inside 'abcdef' grams
    assert(d("ngramSearch('abcdef', 'abcde')") == 1.0)
    assert(d("ngramDistanceCaseInsensitive('ABCDEF', 'abcdef')") == 0.0)
    assert(d("ngramSearchCaseInsensitive('ABCDEF', 'abcde')") == 1.0)
    assert(s("initcapUTF8('hello world')") == "Hello World")
  }

  test("toRelative*Num family: monotone epoch-anchored bucket ids") {
    val r = spark.sql(
      """SELECT toRelativeSecondNum(timestamp'1970-01-01 00:01:40') AS sec,
                toRelativeWeekNum(date'1970-01-01') AS w0,
                toRelativeWeekNum(date'1970-01-05') AS w1,
                toRelativeMonthNum(date'2024-03-15') AS m,
                toRelativeQuarterNum(date'2024-12-31') AS q,
                toRelativeYearNum(date'2024-06-01') AS y""").head()
    assert(r.getLong(0) == 100L)
    // Jan 1 1970 (Thu) and Jan 5 (Mon) land in consecutive Monday-weeks
    assert(r.getLong(2) == r.getLong(1) + 1)
    assert(r.getInt(3) == 2024 * 12 + 3)
    assert(r.getInt(4) == 2024 * 4 + 3)
    assert(r.getInt(5) == 2024)
  }

  test("timeSlots: every slot boundary the interval touches") {
    val r = spark.sql(
      """SELECT timeSlots(timestamp'1970-01-01 00:20:00', 3600) AS s,
                timeSlots(timestamp'1970-01-01 00:00:00', 600, 300) AS fine""").head()
    // 00:20 .. 01:20 touches slots 00:00, 00:30, 01:00
    assert(r.getSeq[java.sql.Timestamp](0).map(_.getTime / 1000).toSeq == Seq(0L, 1800L, 3600L))
    assert(r.getSeq[java.sql.Timestamp](1).map(_.getTime / 1000).toSeq == Seq(0L, 300L, 600L))
  }

  test("widthBucket: camel spelling resolves to the native expression") {
    assert(l("widthBucket(5.35, 0.0, 10.0, 5)") == 3L)
    assert(l("widthBucket(-1.0, 0.0, 10.0, 5)") == 0L)
    assert(l("widthBucket(11.0, 0.0, 10.0, 5)") == 6L)
  }

  test("formatReadableDecimalSize: 1000-based units") {
    assert(s("formatReadableDecimalSize(1)") == "1.00 B")
    assert(s("formatReadableDecimalSize(1500)") == "1.50 KB")
    assert(s("formatReadableDecimalSize(2500000)") == "2.50 MB")
  }

  test("parseReadableSize: binary and SI units, ceil, OrNull/OrZero absorb junk") {
    assert(l("parseReadableSize('1 KiB')") == 1024L)
    assert(l("parseReadableSize('1.5 KiB')") == 1536L)
    assert(l("parseReadableSize('5.00 MB')") == 5000000L)
    assert(l("parseReadableSize('3 B')") == 3L)
    assert(l("parseReadableSize('1.1 B')") == 2L) // ceil to whole bytes
    val r = spark.sql(
      """SELECT parseReadableSizeOrNull('junk') AS n, parseReadableSizeOrZero('junk') AS z,
                parseReadableSizeOrNull('2 TiB') AS t""").head()
    assert(r.isNullAt(0) && r.getLong(1) == 0L)
    assert(r.getLong(2) == 2L * 1024 * 1024 * 1024 * 1024)
    intercept[Exception] {
      spark.sql("SELECT parseReadableSize('nope') AS v").collect()
    }
  }

  test("base58: Bitcoin-alphabet round trip, leading-zero preservation, try variant") {
    assert(s("base58Encode('Hello')") == "9Ajdvzr")
    assert(s("base58Decode('9Ajdvzr')") == "Hello")
    assert(s("base58Encode('')") == "")
    assert(s("base58Decode(base58Encode('clickhouse.build'))") == "clickhouse.build")
    assert(s("tryBase58Decode('0invalid!')") == "")
    intercept[Exception] { spark.sql("SELECT base58Decode('0') AS v").collect() }
  }

  test("base64URL: unpadded URL-safe alphabet round trip") {
    assert(s("base64URLEncode('https://clickhouse.com')") == "aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ")
    assert(s("base64URLDecode('aHR0cHM6Ly9jbGlja2hvdXNlLmNvbQ')") == "https://clickhouse.com")
    // '>' encodes to Pg in url-safe (would be + / in standard)
    assert(s("base64URLEncode('>>>?')") == "Pj4-Pw")
    assert(s("tryBase64URLDecode('!!!')") == "")
  }

  test("punycode: RFC 3492 vectors and round trip; IDNA whole domains") {
    assert(s("punycodeEncode('München')") == "Mnchen-3ya")
    assert(s("punycodeEncode('bücher')") == "bcher-kva")
    assert(s("punycodeDecode('Mnchen-3ya')") == "München")
    assert(s("punycodeDecode(punycodeEncode('αβγ'))") == "αβγ")
    assert(s("idnaEncode('münchen.example.com')") == "xn--mnchen-3ya.example.com")
    assert(s("idnaDecode('xn--mnchen-3ya.example.com')") == "münchen.example.com")
    assert(s("tryPunycodeDecode('§bad§')") == "")
  }

  test("arrayROCAUC: hand-checked rank AUC with ties; arrayAUC alias") {
    // scores [.1 .4 .35 .8], labels [0 0 1 1] → AUC = 0.75 (sklearn's example)
    assert(d("arrayROCAUC(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1))") == 0.75)
    assert(d("arrayAUC(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1))") == 0.75)
    // perfect separation → 1.0; inverted → 0.0
    assert(d("arrayROCAUC(array(1.0, 2.0, 3.0, 4.0), array(0, 0, 1, 1))") == 1.0)
    assert(d("arrayROCAUC(array(4.0, 3.0, 2.0, 1.0), array(0, 0, 1, 1))") == 0.0)
    // all-tied scores → 0.5
    assert(d("arrayROCAUC(array(1.0, 1.0, 1.0, 1.0), array(0, 1, 0, 1))") == 0.5)
    // degenerate single-class input → 0
    assert(d("arrayROCAUC(array(1.0, 2.0), array(1, 1))") == 0.0)
  }

  test("arrayNormalizedGini: ideal ordering scores 1, binary case is 2·AUC−1") {
    assert(math.abs(d("arrayNormalizedGini(array(4.0, 3.0, 2.0, 1.0), array(1, 1, 0, 0))") - 1.0) < 1e-12)
    val auc = d("arrayROCAUC(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1))")
    val gini = d("arrayNormalizedGini(array(0.1, 0.4, 0.35, 0.8), array(0, 0, 1, 1))")
    assert(math.abs(gini - (2 * auc - 1)) < 1e-12)
  }

  test("arrayCumSumNonNegative clamps dips at zero; arrayPartialShuffle permutes") {
    val r = spark.sql(
      """SELECT arrayCumSumNonNegative(array(1, 1, -4, 1)) AS c,
                array_sort(arrayPartialShuffle(array(5, 1, 4, 2, 3), 2, 7)) AS p,
                arrayZipUnaligned(array(1, 2, 3), array('a')) AS z""").head()
    assert(r.getSeq[Double](0) == Seq(1.0, 2.0, 0.0, 1.0))
    assert(r.getSeq[Int](1) == Seq(1, 2, 3, 4, 5))
    val z = r.getSeq[org.apache.spark.sql.Row](2)
    assert(z.length == 3 && z.head.getInt(0) == 1 && z.head.getString(1) == "a" && z(2).isNullAt(1))
  }

  test("hash value-parity kernels: published check vectors") {
    // xxHash spec test vectors (seed 0, empty input)
    assert(l("xxHash64('')") == -1205034819632174695L) // 0xEF46DB3751D8E999
    assert(l("xxHash32('')") == 46947589L)             // 0x02CC5D05
    // CRC catalog check values over '123456789'
    assert(l("CRC32('123456789')") == 3421780262L)     // 0xCBF43926
    assert(l("CRC32IEEE('123456789')") == 3421780262L)
    assert(l("CRC64('123456789')") == -7395533204333446662L) // 0x995DC9BBDF1939FA (XZ variant)
    // JVM String.hashCode and MD5-prefix
    assert(l("javaHash('abc')") == 96354L)
    assert(l("halfMD5('')") == -3162216497309240828L)
    assert(l("halfMD5('abc')") == -8070080442485551184L)
    // determinism + distinctness across the alias family
    val r = spark.sql(
      """SELECT farmHash64('x') AS f, farmFingerprint64('x') AS ff,
                kafkaMurmurHash('x') AS km, gccMurmurHash('x') AS gm, xxh3('x') AS x3""").head()
    val vals = (0 until 5).map(r.getLong)
    assert(vals.distinct.length == 5)
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 0xFFFFFFFFL) // kafka's UInt32 range
  }

  test("xxHash64/CRC32 registration must not shadow the variadic/binary builtins") {
    import org.apache.spark.sql.functions._
    // Column-API resolution goes BY NAME in Spark 4 — the injected CH
    // spelling must keep non-(single string) shapes on the builtin
    val df = spark.range(3).select(
      xxhash64(org.apache.spark.sql.functions.array(col("id"), col("id"))).as("arr"),
      xxhash64(col("id"), col("id")).as("multi"),
      crc32(col("id").cast("string").cast("binary")).as("c"))
    assert(df.collect().length == 3) // would ClassCastException if shadowed
    // and SQL multi-arg spelling stays variadic too
    assert(spark.sql("SELECT xxHash64(1, 2) AS h").head().getLong(0) ==
           spark.sql("SELECT xxhash64(1, 2) AS h").head().getLong(0))
  }

  test("scalar text sketches: stable, edit-tolerant, parameterized") {
    val r = spark.sql(
      """SELECT ngramMinHash('the quick brown fox') AS nm,
                ngramMinHash('the quick brown fox') AS nm2,
                wordShingleMinHash('a b c d e f') AS wm,
                ngramSimHash('hello world hello world') AS ns,
                wordShingleSimHash('a b c d e f') AS ws""").head()
    val nm = r.getStruct(0); val nm2 = r.getStruct(1)
    assert(nm.getLong(0) == nm2.getLong(0) && nm.getLong(1) == nm2.getLong(1))
    assert(nm.getLong(0) != nm.getLong(1))
    assert(r.getStruct(2).getLong(0) != 0L)
    assert(r.getLong(3) != r.getLong(4))
    // one-word edit keeps the min-end digest of a long document alive
    // more often than not — at minimum the call shape works with
    // explicit params
    val p = spark.sql(
      "SELECT ngramMinHash('abcdefgh', 4, 2) AS a, wordShingleSimHash('x y z w', 2) AS b").head()
    assert(p.getStruct(0).getLong(0) != 0L)
  }

  test("seriesOutliersDetectTukey: fence distances, zero inside") {
    val r = spark.sql(
      "SELECT seriesOutliersDetectTukey(array(1.0, 2.0, 3.0, 2.0, 100.0, 2.0, 1.0)) AS s").head()
    val scores = r.getSeq[Double](0)
    assert(scores.count(_ != 0.0) == 1)
    assert(scores(4) > 0.0) // the 100 spikes above the upper fence
    // custom band: zero-width IQR puts both fences at 1, so 50 scores 49
    val t = spark.sql(
      "SELECT seriesOutliersDetectTukey(array(1.0, 1.0, 1.0, 1.0, 50.0), 0.25, 0.75, 0.5) AS s").head()
    assert(t.getSeq[Double](0).last == 49.0)
  }

  test("seriesPeriodDetectFFT: recovers a planted period") {
    // sin wave with period 8 over 64 samples
    val r = spark.sql(
      """SELECT seriesPeriodDetectFFT(transform(sequence(0, 63),
                  i -> sin(2 * pi() * i / 8))) AS p,
                seriesPeriodDetectFFT(array(5.0, 5.0, 5.0, 5.0, 5.0)) AS flat""").head()
    assert(r.getDouble(0) == 8.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("seriesDecomposeSTL: seasonal+trend+residual reconstructs the series") {
    val r = spark.sql(
      """SELECT seriesDecomposeSTL(transform(sequence(0, 23),
                  i -> double(i) + element_at(array(10.0, -5.0, -5.0, 0.0), int(i % 4) + 1)), 4) AS d""").head()
    val parts = r.getSeq[scala.collection.Seq[Double]](0).map(_.toSeq)
    assert(parts.length == 3)
    val Seq(seasonal, trend, residual) = parts
    assert(seasonal.length == 24 && trend.length == 24 && residual.length == 24)
    // seasonal sums to ~0 over one period
    assert(math.abs(seasonal.take(4).sum) < 1e-9)
    // reconstruction: x == s + t + r by construction
    val x = (0 until 24).map(i => i.toDouble + Seq(10.0, -5.0, -5.0, 0.0)(i % 4))
    val recon = (0 until 24).map(i => seasonal(i) + trend(i) + residual(i))
    x.zip(recon).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // interior trend of a linear+seasonal series is the line itself
    assert(math.abs(trend(10) - 10.0) < 0.75)
  }

  test("rand distribution family: moments land near theory on 20k draws") {
    val r = spark.sql(
      """SELECT avg(u) AS u, avg(n) AS n, stddev_samp(n) AS ns,
                avg(e) AS e, avg(b) AS b, avg(ln) AS ln
         FROM (SELECT randUniform(2, 6) AS u, randNormal(10, 2) AS n,
                      randExponential(4.0) AS e, randBernoulli(0.3) AS b,
                      randLogNormal(0.0, 0.25) AS ln
               FROM numbers(20000))""").head()
    assert(math.abs(r.getDouble(0) - 4.0) < 0.1)    // U(2,6) mean 4
    assert(math.abs(r.getDouble(1) - 10.0) < 0.1)   // N(10,2) mean
    assert(math.abs(r.getDouble(2) - 2.0) < 0.1)    // N(10,2) sd
    assert(math.abs(r.getDouble(3) - 0.25) < 0.02)  // Exp(4) mean 1/4
    assert(math.abs(r.getDouble(4) - 0.3) < 0.02)   // Bernoulli(0.3)
    assert(math.abs(r.getDouble(5) - math.exp(0.03125)) < 0.03) // LN mean e^{σ²/2}
  }

  test("generateUUIDv7: v7 format, time-ordered prefix, distinct; round trip to ms") {
    val rows = spark.sql(
      "SELECT generateUUIDv7() AS u FROM numbers(50)").collect().map(_.getString(0))
    assert(rows.distinct.length == 50)
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    rows.foreach(u => assert(re.findFirstIn(u).isDefined, s"malformed uuidv7: $u"))
    val ms = spark.sql(
      s"SELECT unix_millis(UUIDv7ToDateTime('${rows.head}')) AS m").head().getLong(0)
    assert(math.abs(ms - System.currentTimeMillis()) < 3600_000L)
  }

  test("greatCircleAngle, pointInEllipses, geohashesInBox") {
    val r = spark.sql(
      """SELECT greatCircleAngle(0, 0, 90, 0) AS quarter,
                pointInEllipses(1.0, 0.5, 0.0, 0.0, 2.0, 1.0) AS inside,
                pointInEllipses(5.0, 5.0, 0.0, 0.0, 2.0, 1.0, 4.0, 4.0, 2.0, 2.0) AS second,
                pointInEllipses(9.0, 9.0, 0.0, 0.0, 1.0, 1.0) AS outside,
                geohashesInBox(-0.2, 50.9, 0.2, 51.1, 3) AS cover""").head()
    assert(math.abs(r.getDouble(0) - 90.0) < 1e-9)
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 0)
    val cover = r.getSeq[String](3 + 1)
    assert(cover.nonEmpty && cover.forall(_.length == 3))
    // London's gcp cell must be in a box around (0, 51)
    assert(cover.exists(_.startsWith("gcp")) || cover.exists(_.startsWith("u10")))
  }

  test("format: sequential {}, positional {N}, brace escapes") {
    assert(s("format('{} owns {}', 'a', 'b')") == "a owns b")
    assert(s("format('{1} then {0}', 'x', 'y')") == "y then x")
    assert(s("format('{{literal}} {}', 42)") == "{literal} 42")
    assert(s("format('no holes')") == "no holes")
    intercept[Exception] { spark.sql("SELECT format('{2}', 'a') AS v").collect() }
  }

  test("tuple arithmetic over array-encoded tuples") {
    val r = spark.sql(
      """SELECT tuplePlus(array(1, 2), array(10, 20)) AS p,
                tupleMinus(array(5.0, 3.0), array(1.0, 1.0)) AS m,
                tupleMultiply(array(2, 3), array(4, 5)) AS x,
                tupleDivide(array(8.0, 9.0), array(2.0, 3.0)) AS d,
                tupleNegate(array(1, -2)) AS n,
                tupleConcat(array(1, 2), array(3)) AS c,
                tupleMultiplyByNumber(array(1.5, 2.5), 2) AS mn,
                tupleDivideByNumber(array(4.0, 6.0), 2) AS dn""").head()
    assert(r.getSeq[Double](0) == Seq(11.0, 22.0))
    assert(r.getSeq[Double](1) == Seq(4.0, 2.0))
    assert(r.getSeq[Double](2) == Seq(8.0, 15.0))
    assert(r.getSeq[Double](3) == Seq(4.0, 3.0))
    assert(r.getSeq[Double](4) == Seq(-1.0, 2.0))
    assert(r.getSeq[Int](5) == Seq(1, 2, 3))
    assert(r.getSeq[Double](6) == Seq(3.0, 5.0))
    assert(r.getSeq[Double](7) == Seq(2.0, 3.0))
  }

  test("isNotDistinctFrom, serverUUID, toDecimal widths") {
    val r = spark.sql(
      """SELECT isNotDistinctFrom(NULL, NULL) AS nn,
                isNotDistinctFrom(1, NULL) AS n1,
                serverUUID() AS su, serverUUID() AS su2,
                toDecimal32(3.14159, 2) AS d32,
                toDecimal64(1234.5678, 4) AS d64,
                toDecimal32OrNull('abc', 2) AS bad""").head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == r.getString(3) && r.getString(2).length == 36)
    assert(r.getDecimal(4).toPlainString == "3.14")
    assert(r.getDecimal(5).toPlainString == "1234.5678")
    assert(r.isNullAt(6))
  }

  test("generateULID: 26-char Crockford, time prefix round-trips to ms") {
    val rows = spark.sql("SELECT generateULID() AS u FROM numbers(20)").collect().map(_.getString(0))
    assert(rows.distinct.length == 20)
    val re = "^[0-9ABCDEFGHJKMNPQRSTVWXYZ]{26}$".r
    rows.foreach(u => assert(re.findFirstIn(u).isDefined, s"malformed ulid: $u"))
    val ms = spark.sql(
      s"SELECT unix_millis(ULIDStringToDateTime('${rows.head}')) AS m").head().getLong(0)
    assert(math.abs(ms - System.currentTimeMillis()) < 3600_000L)
  }

  test("avgMap: per-key means from parallel arrays and map input") {
    val r = spark.sql(
      """SELECT avgMap(k, v) AS am
         FROM VALUES (array('a', 'b'), array(10, 20)),
                     (array('a'), array(30)) t(k, v)""").head()
    val st = r.getStruct(0)
    assert(st.getSeq[String](0) == Seq("a", "b"))
    assert(st.getSeq[Double](1) == Seq(20.0, 20.0))
  }

  test("quantileDD: parametric spelling lands within accuracy of the exact median") {
    graft.sources.Tables(spark, "/root/testdata/sf0.001").lineitem.createOrReplaceTempView("li_dd")
    val r = spark.sql(
      """SELECT quantileDD(0.01)(l_extendedprice) AS p50,
                quantileDD(0.01, 0.9)(l_extendedprice) AS p90,
                percentile(l_extendedprice, 0.5) AS e50
         FROM li_dd""").head()
    assert(math.abs(r.getDouble(0) - r.getDouble(2)) / r.getDouble(2) < 0.05)
    assert(r.getDouble(1) > r.getDouble(0))
  }

  test("tumble/hop window scalars: fixed-grid bounds from interval literals") {
    val r = spark.sql(
      """SELECT tumbleStart(timestamp'1970-01-01 00:20:00', INTERVAL 15 MINUTE) AS ts,
                tumbleEnd(timestamp'1970-01-01 00:20:00', INTERVAL 15 MINUTE) AS te,
                tumble(timestamp'1970-01-01 00:20:00', INTERVAL 15 MINUTE) AS t,
                hopStart(timestamp'1970-01-01 00:20:00', INTERVAL 5 MINUTE, INTERVAL 15 MINUTE) AS hs,
                hopEnd(timestamp'1970-01-01 00:20:00', INTERVAL 5 MINUTE, INTERVAL 15 MINUTE) AS he""").head()
    def sec(i: Int) = r.getTimestamp(i).getTime / 1000
    assert(sec(0) == 900L && sec(1) == 1800L)
    val t = r.getStruct(2)
    assert(t.getTimestamp(0).getTime / 1000 == 900L && t.getTimestamp(1).getTime / 1000 == 1800L)
    assert(sec(3) == 1200L && sec(4) == 2100L) // hop slot 20:00, +15min window
    intercept[Exception] {
      spark.sql("SELECT tumbleStart(now(), INTERVAL 1 MONTH) AS v").collect()
    }
  }

  test("sub-second interval constructors compose with toStartOfInterval") {
    val r = spark.sql(
      """SELECT toStartOfInterval(timestamp'1970-01-01 00:00:00.777', toIntervalMillisecond(250)) AS ms,
                unix_micros(timestamp'1970-01-01 00:00:00' + toIntervalMicrosecond(1500)) AS us,
                unix_micros(timestamp'1970-01-01 00:00:00' + toIntervalNanosecond(2000)) AS ns""").head()
    assert(r.getTimestamp(0).getTime == 750L)
    assert(r.getLong(1) == 1500L)
    assert(r.getLong(2) == 2L) // ns truncates to the µs axis
  }

  test("getSubcolumn, nowInBlock, quantileTDigestWeighted") {
    val r = spark.sql(
      """SELECT getSubcolumn(named_struct('a', 7, 'b', 'x'), 'a') AS a,
                nowInBlock() AS nb""").head()
    assert(r.getInt(0) == 7)
    assert(math.abs(r.getTimestamp(1).getTime - System.currentTimeMillis()) < 3600_000L)
    val q = spark.sql(
      """SELECT quantileTDigestWeighted(0.5)(double(v), w) AS med
         FROM VALUES (1.0, 1), (10.0, 8), (100.0, 1) t(v, w)""").head()
    assert(q.getDouble(0) == 10.0)
  }

  test("zeros(N) table function joins the numbers() rewrite") {
    val r = spark.sql("SELECT count(*) AS c, sum(zero) AS s FROM zeros(7)").head()
    assert(r.getLong(0) == 7L && r.getLong(1) == 0L)
    // numbers() still works alongside
    assert(spark.sql("SELECT sum(number) AS s FROM numbers(5)").head().getLong(0) == 10L)
  }
}
