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

  test("damerauLevenshteinDistance: OSA transposition counts one edit") {
    assert(l("damerauLevenshteinDistance('ab', 'ba')") == 1L)
    assert(l("damerauLevenshteinDistance('ca', 'abc')") == 3L) // OSA, not unrestricted DL
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
}
