package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Fraction-based
  * TABLESAMPLE is nondeterministic under parallelism (partition
  * layout changes the draw); these samplers are CONTENT-ADDRESSED —
  * the keep/drop decision is a pure function of the row's key — so a
  * sample is reproducible across runs, engines, partition counts and
  * cluster sizes, and composable (the same row samples identically
  * in every pipeline stage that sees it).
  */
object Sampling {

  /** 256-bucket content hash: the two leading hex nibbles of
    * md5(key). Uniform over buckets for any key with entropy;
    * resolution of every derived rate is therefore 1/256. */
  def bucketOf(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 2), 16, 10).cast("int")

  /** Keep a `rate` fraction of rows, content-addressed. */
  def sample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.where(bucketOf(key) < lit((rate * 256).round.toInt))

  /** Stratified sample: per-stratum keep rates (training-data mixing
    * — e.g. down-sample an over-represented language while keeping
    * all of the rare ones). Strata not in `rates` use `defaultRate`.
    * Pure projection + filter: no shuffle, pushes down to the scan. */
  def stratified(df: DataFrame, key: Column, strata: Column,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * 256).round.toInt): Column) {
      case (acc, (s, r)) => when(strata === s, lit((r * 256).round.toInt)).otherwise(acc)
    }
    df.where(bucketOf(key) < threshold)
  }

  /** Table → sample-key SQL expression, the engine's analog of
    * ClickHouse's table-level `SAMPLE BY <expr>` DDL clause. A table
    * registered here makes `FROM t SAMPLE 0.25` rewrite
    * ([[graft.plans.ChSqlParser]]) to the content-addressed bucket
    * filter above instead of nondeterministic TABLESAMPLE — the
    * sample becomes reproducible across runs, engines and partition
    * layouts, hence oracle-able. */
  private val sampleKeys = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerSampleBy(table: String, keyExprSql: String): Unit =
    sampleKeys.put(table.toLowerCase, keyExprSql)

  def sampleKeyFor(table: String): Option[String] =
    Option(sampleKeys.get(table.toLowerCase))
}
