package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, Dataset, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** ClickHouse format names mapped onto Spark's readers/writers — the
  * file-ingestion surface a migrated `INSERT … FORMAT CSVWithNames` /
  * `SELECT … INTO OUTFILE … FORMAT JSONEachRow` workflow expects
  * (reference: the client-side FORMAT clause ChSqlParser strips from
  * queries; files are where those formats actually live here).
  *
  * Supported names (case-sensitive, CH spellings): CSV /
  * CSVWithNames, TSV / TabSeparated / TSVWithNames /
  * TabSeparatedWithNames, JSONEachRow, Parquet, ORC, Arrow /
  * ArrowStream (round 19, [[ArrowIpc]]). Unknown names
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
    // Arrow formats carry a structural schema (like Parquet/ORC) —
    // the DDL parameter is ignored, never silently applied
    if (format == "Arrow") return ArrowIpc.readDir(spark, path, stream = false)
    if (format == "ArrowStream") return ArrowIpc.readDir(spark, path, stream = true)
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

  private def isWithNames(format: String): Boolean =
    format == "CSVWithNames" || format == "TSVWithNames" || format == "TabSeparatedWithNames"

  /** Map a header-named raw frame (all strings) onto the target
    * schema BY NAME — ClickHouse's *WithNames convention (positional
    * mapping would silently land values in the wrong columns when
    * the file's column order differs from the INSERT's). A header
    * missing a target column refuses; a value that does not parse as
    * the target type refuses (one extra aggregate pass — this is the
    * console/script ingestion surface, not the bulk landing path;
    * a post-hoc cast would silently NULL bad values instead). */
  private def mapByName(raw: DataFrame, schema: StructType, ctx: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, when}
    val missing = schema.fieldNames.toSeq.filterNot(raw.columns.contains)
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"$ctx: the file header lacks column(s) ${missing.mkString(", ")} " +
        s"(header: ${raw.columns.mkString(", ")})")
    val nonStr = schema.fields.toSeq.filterNot(_.dataType.isInstanceOf[StringType])
    if (nonStr.nonEmpty) {
      // try_cast, not cast: under ANSI (Spark 4's default) a plain
      // cast THROWS mid-aggregate with Spark's own message — the
      // point of this pass is to refuse with the offending COLUMN
      val counts = raw.select(nonStr.map(f =>
        count(when(col(f.name).isNotNull && col(f.name).try_cast(f.dataType).isNull, 1))
          .as(f.name)): _*).head()
      nonStr.zipWithIndex.foreach { case (f, i) =>
        if (counts.getLong(i) > 0) throw new IllegalArgumentException(
          s"$ctx: ${counts.getLong(i)} value(s) in header column '${f.name}' do not " +
            s"parse as ${f.dataType.sql}")
      }
    }
    raw.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** Ingestion-strict file read: parser mode FAILFAST, so malformed
    * rows and failed type conversions REFUSE instead of landing
    * NULLs (CH rejects malformed input rows); *WithNames formats map
    * by HEADER NAME via [[mapByName]], positional formats by the
    * schema's order. Parquet/ORC ignore the mode (their schema is
    * structural) and map by name as always. */
  def readIngest(spark: SparkSession, path: String, format: String,
                 schema: StructType, ctx: String): DataFrame =
    if (format == "Arrow" || format == "ArrowStream") {
      // structural schema, like Parquet: map by NAME onto the target
      // columns with casts; a missing column refuses
      import org.apache.spark.sql.functions.col
      val raw = ArrowIpc.readDir(spark, path, format == "ArrowStream")
      val missing = schema.fieldNames.toSeq.filterNot(raw.columns.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"$ctx FORMAT $format: the file lacks column(s) ${missing.mkString(", ")} " +
          s"(file schema: ${raw.columns.mkString(", ")})")
      raw.select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    } else if (isWithNames(format)) {
      val (r, _) = base(spark.read.option("mode", "FAILFAST")
        .option("inferSchema", "false"), format)
      mapByName(r.csv(path), schema, s"$ctx FORMAT $format")
    } else {
      val (r, src) = base(spark.read.option("mode", "FAILFAST").schema(schema), format)
      src match {
        case "csv"     => r.csv(path)
        case "json"    => r.json(path)
        case "parquet" => r.parquet(path)
        case "orc"     => r.orc(path)
      }
    }

  /** Ingestion-strict parse of inline text rows (the `INSERT … FORMAT
    * f⏎rows` payload, already record-split by the caller): the text
    * formats only; same FAILFAST + by-name contract as
    * [[readIngest]]. */
  def parseIngest(spark: SparkSession, rows: Dataset[String], format: String,
                  schema: StructType, ctx: String): DataFrame =
    if (isWithNames(format)) {
      val (r, _) = base(spark.read.option("mode", "FAILFAST")
        .option("inferSchema", "false"), format)
      mapByName(r.csv(rows), schema, s"$ctx FORMAT $format")
    } else {
      val (r, src) = base(spark.read.option("mode", "FAILFAST").schema(schema), format)
      src match {
        case "csv"  => r.csv(rows)
        case "json" => r.json(rows)
        case other => throw new UnsupportedOperationException(
          s"$ctx FORMAT $format: inline payloads execute for text formats only ($other is binary)")
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
    case "Arrow"        => ArrowIpc.writeDir(df, path, stream = false)
    case "ArrowStream"  => ArrowIpc.writeDir(df, path, stream = true)
    case other => throw new IllegalArgumentException(s"Formats: unsupported format '$other'")
  }
}
