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

  /** Domain-mixture sampling to a size budget — the training-mix op
    * ("hit B total tokens with relative domain weights w"): per-domain
    * keep rate = min(1, B·w_d/Σw ÷ avail_d), computed IN the plan (one
    * tiny per-domain agg + a broadcast join back — no driver collect),
    * keep decision content-addressed on the row key at 1/16⁶
    * resolution. Domains short of their target keep everything (rate
    * caps at 1); up-weighting beyond 1 (epoch repeats) is a
    * training-loop concern, not a sampling one. Deterministic: same
    * corpus, weights and budget → the same sample on any engine, any
    * partitioning — and therefore SQL-oracle-able. The single-
    * partition window runs over #domains rows (tiny by construction).
    *
    * Output contract: the input rows that survive the draw, PLUS a
    * `mix_rate` column carrying the domain's keep rate (callers
    * report it; q90c does). Input columns named `mix_rate` or
    * `__dom` would make the internal join ambiguous — refused
    * upfront rather than failing downstream with an ambiguous-
    * reference error.
    *
    * NULL handling is explicit, never a silent drop: a NULL domain
    * is a stratum like any other (null-safe `<=>` join, so its rows
    * flow through the same rate machinery), and `weightOf` MUST
    * assign every domain — including NULL — a non-null weight, or
    * the query fails loudly at execution (assign 0.0 to drop a
    * stratum deterministically instead). */
  def mixtureByBudget(df: DataFrame, key: Column, domain: Column, size: Column,
                      weightOf: Column => Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    for (reserved <- Seq("mix_rate", "__dom"))
      require(!df.columns.contains(reserved),
        s"mixtureByBudget: input already has a '$reserved' column — rename it first")
    val rates = df.groupBy(domain.as("__dom")).agg(sum(size).as("__avail"))
      .withColumn("__w", coalesce(weightOf(col("__dom")).cast("double"),
        raise_error(concat(lit("mixtureByBudget: weightOf returned NULL for domain '"),
          coalesce(col("__dom").cast("string"), lit("NULL")),
          lit("' — every domain (including NULL) needs an explicit weight; use 0.0 to drop one")))
          .cast("double")))
      .withColumn("__wsum", sum(col("__w")).over(Window.partitionBy()))
      .withColumn("mix_rate",
        least(lit(1.0), lit(budget.toDouble) * col("__w") / col("__wsum") / col("__avail")))
      .select(col("__dom"), col("mix_rate"))
    val u = conv(substring(md5(key.cast("binary")), 1, 6), 16, 10).cast("double") / lit(16777216.0)
    df.join(broadcast(rates), domain <=> col("__dom"))
      .where(u < col("mix_rate"))
      .drop("__dom")
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

/** Deterministic global shuffle — the training-order pass: every epoch
  * visits the corpus in a different but REPRODUCIBLE pseudo-random
  * order, keyed by `md5(seed || id)` (content-addressed like SAMPLE,
  * so any engine — and any rerun — derives the same permutation).
  *
  * Scale shape: a single global row_number() would sort the corpus in
  * ONE partition. Instead the key's leading hex nibble forms 16
  * ordered shards (shard-major order IS key order, because the shard
  * is the key's prefix): positions are a per-shard window plus each
  * shard's prefix-sum offset — a tiny 16-row aggregate — so every
  * sort is shard-bounded. Raise the nibble count for more parallelism
  * (two nibbles → 256 shards) at 100 TB.
  */
object Shuffle {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** Append `epoch_pos` (0-based global position for this epoch's
    * permutation) and `shuffle_shard` to `df`. Ties on the md5 key
    * break by id, so the order is total on both engines. */
  def epochOrder(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val key = md5(concat_ws("-", lit(seed), col(idCol).cast("string")))
    val shard = (instr(lit("0123456789abcdef"), substring(key, 1, 1)) - 1).cast("int")
    val withKey = df.withColumn("__sk", key).withColumn("shuffle_shard", shard)
    val inShard = row_number().over(
      Window.partitionBy(col("shuffle_shard")).orderBy(col("__sk"), col(idCol)))
    val counts = withKey.groupBy("shuffle_shard")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("shuffle_shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shuffle_shard"), col("__offset"))
    withKey.withColumn("__rn", inShard)
      .join(broadcast(counts), Seq("shuffle_shard"))
      .withColumn("epoch_pos", col("__offset") + col("__rn") - 1)
      .drop("__sk", "__rn", "__offset")
  }
}
