package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract the build is judged against;
  * this spec makes doc rot impossible: every checklist bullet's query
  * name must exist in the registry, every registry query must appear
  * in SURVEY §2, and every registered query must carry an oracle
  * unless SURVEY marks it ⭕ (seeded/approximate → rows-only). */
class SurveyConsistencySpec extends AnyFunSuite {

  private val surveyText =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
  private val section2 = surveyText.split("## §3")(0)

  private val QName = """`(q\d+[a-z0-9]*_\w+)`""".r
  private def namesIn(text: String): Set[String] =
    QName.findAllMatchIn(text).map(_.group(1)).toSet

  test("every SURVEY §2 checklist query exists in the registry") {
    val documented = namesIn(section2)
    val registered = SparkEntry.queries.keySet
    val missing = documented -- registered
    assert(missing.isEmpty, s"SURVEY §2 names absent from registry: ${missing.toSeq.sorted}")
  }

  test("every registry query is documented in SURVEY §2") {
    val documented = namesIn(section2)
    val undocumented = SparkEntry.queries.keySet -- documented
    assert(undocumented.isEmpty,
      s"registry queries missing from SURVEY §2: ${undocumented.toSeq.sorted}")
  }

  test("the §2 registry-count line matches SparkEntry (prose can't drift)") {
    val CountLine = """\*\*Registry: (\d+) queries — (\d+) oracle-able, (\d+) seeded rows-only""".r
    val m = CountLine.findFirstMatchIn(section2)
      .getOrElse(fail("SURVEY §2 must carry the machine-checked registry-count line"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY says ${m.group(1)} queries, registry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"SURVEY says ${m.group(2)} oracle-able, registry has ${SparkEntry.oracleSql.size}")
    assert(m.group(3).toInt == SparkEntry.queries.size - SparkEntry.oracleSql.size,
      "rows-only count must be queries minus oracled")
  }

  test("⭕ entries and ONLY ⭕ entries run without an oracle") {
    val rowsOnly = section2.linesIterator.filter(_.contains("⭕"))
      .flatMap(l => QName.findAllMatchIn(l).map(_.group(1))).toSet
    val oracled = SparkEntry.oracleSql.keySet
    val all = SparkEntry.queries.keySet
    val unexpectedNoOracle = (all -- oracled) -- rowsOnly
    val rowsOnlyWithOracle = rowsOnly & oracled
    assert(unexpectedNoOracle.isEmpty,
      s"queries lacking an oracle but not marked ⭕ in SURVEY: ${unexpectedNoOracle.toSeq.sorted}")
    assert(rowsOnlyWithOracle.isEmpty,
      s"queries marked ⭕ but carrying an oracle (promote to ✅): ${rowsOnlyWithOracle.toSeq.sorted}")
  }
}
