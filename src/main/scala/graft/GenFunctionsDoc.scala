package graft

/** Regenerates docs/FUNCTIONS.md from the live ChDialect registry so
  * the doc can never drift from the code. Run with the usual
  * classes + spark-jars classpath: `java -cp ... graft.GenFunctionsDoc`.
  */
object GenFunctionsDoc {
  def main(args: Array[String]): Unit = {
    val names = graft.plans.ChDialect.functions.map(_._1).distinct.sorted
    val cols = 4
    val rows = (names.length + cols - 1) / cols
    val table = (0 until rows).map { r =>
      (0 until cols).map { c =>
        val i = c * rows + r
        if (i < names.length) s"`${names(i)}`" else ""
      }.mkString("| ", " | ", " |")
    }.mkString("\n")
    val doc =
      s"""# ClickHouse function surface
         |
         |${names.length} ClickHouse-spelled functions registered natively by
         |`graft.plans.ChDialect` (plus every Spark built-in, which resolves
         |case-insensitively - `isNaN`, `lower`, `concat`, ... need no shim).
         |Parametric spellings (`quantile(0.5)(x)`, `topK(5)(v)`, ...) are
         |flattened by `graft.plans.ChSqlParser` before parsing; the same
         |parser handles clause-level dialect (LIMIT BY, WITH TIES, ARRAY
         |JOIN, WITH FILL, FINAL, PREWHERE, GLOBAL, SETTINGS/FORMAT/INTO
         |OUTFILE tails, scalar WITH, ASOF JOIN, SAMPLE [OFFSET], CH type
         |names in CAST).
         |
         || | | | |
         ||---|---|---|---|
         |$table
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("docs/FUNCTIONS.md"),
      doc.getBytes("UTF-8"))
    println(s"wrote docs/FUNCTIONS.md (${names.length} names)")
  }
}
