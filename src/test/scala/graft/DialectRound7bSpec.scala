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
}
