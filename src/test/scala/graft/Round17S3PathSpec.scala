package graft

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Round 17: the `s3('s3://…')` → s3a:// mapping was written in round
  * 12 but nothing could drive it offline (no hadoop-aws jar on the
  * zero-egress sandbox). This spec pins the CONTRACT at the plan
  * level — the rewrite's constructed relation identifier (scheme,
  * path, format) is visible in the parsed plan without touching any
  * filesystem — plus the refusal edges, and drives the same rewrite
  * end-to-end through file() on a local parquet (identical code path,
  * only the scheme mapping differs).
  */
class Round17S3PathSpec extends SparkSpec {
  import spark.implicits._

  private def parsed(sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  private def relationIdent(plan: LogicalPlan): Seq[Seq[String]] =
    plan.collect { case r: UnresolvedRelation => r.multipartIdentifier }

  test("s3('s3://…', 'Parquet') constructs a parquet read on the s3a scheme") {
    val idents = relationIdent(parsed("SELECT * FROM s3('s3://bucket/data/part.parquet', 'Parquet')"))
    assert(idents == Seq(Seq("parquet", "s3a://bucket/data/part.parquet")))
  }

  test("format inference from the extension (CH's default) survives the scheme mapping") {
    val idents = relationIdent(parsed("SELECT * FROM s3('s3://b/t.csv')"))
    assert(idents == Seq(Seq("csv", "s3a://b/t.csv")))
    val j = relationIdent(parsed("SELECT * FROM s3('s3://b/t.jsonl')"))
    assert(j == Seq(Seq("json", "s3a://b/t.jsonl")))
  }

  test("INSERT INTO FUNCTION s3(...) writes through INSERT OVERWRITE DIRECTORY on s3a") {
    val plan = parsed(
      "INSERT INTO FUNCTION s3('s3://b/out/', 'Parquet') SELECT 1 AS x")
    val dirs = plan.collect {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoDir =>
        (i.storage.locationUri.map(_.toString), i.provider)
    }
    // the URI normalizer drops the trailing slash — the scheme and
    // bucket/key are the contract
    assert(dirs == Seq((Some("s3a://b/out"), Some("parquet"))), plan.toString)
  }

  test("credentials in the URL refuse with provider-chain guidance (read and write)") {
    val e = intercept[IllegalArgumentException](
      parsed("SELECT * FROM s3('s3://AKIA123:sEcReT@bucket/x.parquet', 'Parquet')"))
    assert(e.getMessage.contains("credential"))
    val w = intercept[IllegalArgumentException](
      parsed("INSERT INTO FUNCTION s3('s3://k:s@b/out/', 'Parquet') SELECT 1"))
    assert(w.getMessage.contains("credential"))
  }

  test("credential-bearing extra arguments refuse toward Hadoop conf / Formats") {
    val e = intercept[UnsupportedOperationException](
      parsed("SELECT * FROM s3('s3://b/x.parquet', 'key', 'secret')"))
    assert(e.getMessage.contains("Hadoop conf"))
  }

  test("header formats without a direct-path spelling route to graft.sources.Formats") {
    val e = intercept[IllegalArgumentException](
      parsed("SELECT * FROM s3('s3://b/x.csv', 'CSVWithNames')"))
    assert(e.getMessage.contains("graft.sources.Formats"))
  }

  test("an s3:// url inside a string LITERAL is data, not syntax") {
    val rows = spark.sql("SELECT 'FROM s3(''s3://b/x.parquet'')' AS t").collect()
    assert(rows.head.getString(0).contains("s3://b/x.parquet"))
  }

  test("the same rewrite executes end-to-end through file() on a local parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s3spec").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.mode("overwrite").parquet(dir)
    val out = spark.sql(s"SELECT id, s FROM file('$dir', 'Parquet') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")))
  }
}
