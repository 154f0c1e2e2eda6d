package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** ClickHouse format names mapped onto Spark's readers/writers — the
  * file-ingestion surface a migrated `INSERT … FORMAT CSVWithNames` /
  * `SELECT … INTO OUTFILE … FORMAT JSONEachRow` workflow expects
  * (reference: the client-side FORMAT clause ChSqlParser strips from
  * queries; files are where those formats actually live here).
  *
  * Supported names (case-sensitive, CH spellings): CSV /
  * CSVWithNames, TSV / TabSeparated / TSVWithNames /
  * TabSeparatedWithNames, JSONEachRow, Parquet, ORC. Unknown names
  * fail loudly. Readers take an optional explicit DDL schema —
  * header-less formats otherwise surface _c0-style names, exactly
  * like Spark, and that is the caller's signal to pass one. */
object Formats {

  private def base(r: DataFrameReader, format: String): (DataFrameReader, String) =
    format match {
      case "CSV"          => (r.option("header", "false"), "csv")
      case "CSVWithNames" => (r.option("header", "true"), "csv")
      case "TSV" | "TabSeparated" =>
        (r.option("header", "false").option("sep", "\t"), "csv")
      case "TSVWithNames" | "TabSeparatedWithNames" =>
        (r.option("header", "true").option("sep", "\t"), "csv")
      case "JSONEachRow"  => (r, "json")
      case "Parquet"      => (r, "parquet")
      case "ORC"          => (r, "orc")
      case other => throw new IllegalArgumentException(s"Formats: unsupported format '$other'")
    }

  def read(spark: SparkSession, path: String, format: String,
           schemaDdl: Option[String] = None): DataFrame = {
    val r0 = spark.read
    val withSchema = schemaDdl.fold(r0.option("inferSchema", "true"))(r0.schema)
    val (r, src) = base(withSchema, format)
    src match {
      case "csv"     => r.csv(path)
      case "json"    => r.json(path)
      case "parquet" => r.parquet(path)
      case "orc"     => r.orc(path)
    }
  }

  def write(df: DataFrame, path: String, format: String): Unit = format match {
    case "CSV"          => df.write.mode("overwrite").option("header", "false").csv(path)
    case "CSVWithNames" => df.write.mode("overwrite").option("header", "true").csv(path)
    case "TSV" | "TabSeparated" =>
      df.write.mode("overwrite").option("header", "false").option("sep", "\t").csv(path)
    case "TSVWithNames" | "TabSeparatedWithNames" =>
      df.write.mode("overwrite").option("header", "true").option("sep", "\t").csv(path)
    case "JSONEachRow"  => df.write.mode("overwrite").json(path)
    case "Parquet"      => df.write.mode("overwrite").parquet(path)
    case "ORC"          => df.write.mode("overwrite").orc(path)
    case other => throw new IllegalArgumentException(s"Formats: unsupported format '$other'")
  }
}
