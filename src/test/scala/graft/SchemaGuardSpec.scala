package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** SURVEY §5 scalar-output contract, enforced: the driver's DuckDB
  * comparator (pandas sort + hash) crashes on array/map/struct cells,
  * so every registry query must emit atomic columns only — arrays are
  * serialized with arrayStringConcat on the Spark side and
  * array_to_string on the oracle side. Round 7 shipped 7 queries that
  * violated this and went red at the gate; this spec makes the
  * violation a local test failure instead. Schemas are resolved by
  * analysis only (no job runs) at sf0.001.
  */
class SchemaGuardSpec extends SparkSpec {

  test("every registry query's output schema is atomic (no array/map/struct columns)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.registry.flatMap { q =>
      val schema = q.run(spark, dir).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.isEmpty) None else Some(s"${q.name} -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"registry queries with non-atomic output columns (violates SURVEY §5):\n  ${offenders.mkString("\n  ")}")
  }
}
