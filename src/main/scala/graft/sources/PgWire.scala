package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** Postgres type-fidelity helpers for the JDBC replication pipeline
  * (reference surface: the migrator takes arbitrary Postgres
  * schema→tables maps — /root/reference/src/tools/data_migrator.py:
  * 23-28 — so the snapshot/CDC path must carry the mainstream PG
  * column shapes value-exactly).
  *
  * The mapping contract, as the pipeline meets each type through
  * `spark.read.jdbc` (Spark's PostgresDialect does the first column;
  * JdbcReplicationSpec proves the semantics hermetically on Derby
  * analogs where noted):
  *
  * | Postgres          | Spark                | Notes |
  * |-------------------|----------------------|-------|
  * | NUMERIC(p≤38, s)  | DecimalType(p, s)    | value-exact; p>38 unsupported (engine decimal bound, same as toDecimal256) |
  * | TIMESTAMPTZ       | TimestampType        | an instant; session TZ pinned UTC renders the same wall clock |
  * | TIMESTAMP         | TimestampNTZType/TimestampType | micros preserved |
  * | UUID              | StringType           | canonical 36-char form |
  * | JSONB / JSON      | StringType           | text form; JSONExtract* family operates on it |
  * | BYTEA             | BinaryType           | byte-exact |
  * | TEXT[] / VARCHAR[]| ArrayType(String)    | native via the PG driver; from text dumps/CSV use [[textArray]] |
  *
  * [[textArray]] parses the PG array TEXT LITERAL form — `{a,"b c",
  * NULL}` with double-quote wrapping and backslash escapes, unquoted
  * NULL as a null element (PG docs §8.15.2 array I/O syntax) — for
  * the paths where an array column arrives as text (CSV/COPY dumps,
  * JDBC drivers without array support). One codegen-fallback kernel,
  * map-side only: no shuffle, scale-neutral.
  */
object PgWire {
  /** `array<string>` from a Postgres array literal (`{...}`); NULL
    * input → NULL, unquoted NULL element → null element. */
  def textArray(c: Column): Column = call_function("graft_pg_text_array", c)
}
