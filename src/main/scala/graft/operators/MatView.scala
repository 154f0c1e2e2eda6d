package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate materialization — the Spark
  * analog of a ClickHouse materialized view into a Summing/
  * AggregatingMergeTree target (the migration tool's recipe for
  * keeping dashboards cheap after replication,
  * /root/reference/src/tools/data_migrator.py's CDC targets).
  *
  * The store holds PARTIAL aggregate states as parquet: each
  * `refresh` aggregates ONLY the new batch (one map-side-combined
  * shuffle over the delta) and appends its per-group states; `read`
  * re-merges states by group — ClickHouse's -State / -Merge contract,
  * with parquet files playing the unmerged parts and `compact` the
  * background merge. At 100 TB this is the difference between
  * re-scanning the fact table per refresh and scanning just the
  * delta: refresh cost is O(batch), read cost is O(groups × parts),
  * and compaction keeps parts bounded exactly like MergeTree merges.
  *
  * States must be mergeable: counts/sums re-sum, min/max re-min/max,
  * avg is carried as (sum, count), distinct as an HLL sketch binary
  * ([[hllCountState]]/[[hllCountMerge]]) — the same algebra
  * SURVEY §2's q35 proves row-exact.
  */
object MatView {

  /** A materialized view: grouping keys, per-batch state expressions,
    * and the per-group merge expressions applied at read. Merge
    * expressions reference state columns BY NAME and must alias their
    * output back to the same name (checked at construction). */
  final case class Spec(
      groupCols: Seq[String],
      states: Seq[(String, Column)],
      merges: Seq[(String, String => Column)]) {
    require(states.map(_._1) == merges.map(_._1),
      "merge list must name exactly the state columns, in order")
  }

  /** count-rows state: partial count per batch, re-summed at read. */
  def countState(name: String): ((String, Column), (String, String => Column)) =
    ((name, count(lit(1)).cast("long")), (name, c => sum(col(c)).cast("long")))

  def sumState(name: String, over: Column): ((String, Column), (String, String => Column)) =
    ((name, sum(over)), (name, c => sum(col(c))))

  def minState(name: String, over: Column): ((String, Column), (String, String => Column)) =
    ((name, min(over)), (name, c => min(col(c))))

  def maxState(name: String, over: Column): ((String, Column), (String, String => Column)) =
    ((name, max(over)), (name, c => max(col(c))))

  /** Exact-up-to-sketch distinct count: HLL sketch binary as the
    * state, union+estimate as the merge (uniqState/uniqMerge). */
  def hllCountState(name: String, over: Column): ((String, Column), (String, String => Column)) =
    ((name, hll_sketch_agg(over)), (name, c => hll_sketch_estimate(hll_union_agg(col(c)))))

  def spec(groupCols: Seq[String],
           parts: ((String, Column), (String, String => Column))*): Spec =
    Spec(groupCols, parts.map(_._1), parts.map(_._2))

  private def partials(batch: DataFrame, spec: Spec): DataFrame =
    batch.groupBy(spec.groupCols.map(col): _*)
      .agg(spec.states.head._2.as(spec.states.head._1),
           spec.states.tail.map { case (n, c) => c.as(n) }: _*)

  /** Initialize (overwrite) the store from a full scan. */
  def init(batch: DataFrame, spec: Spec, path: String): Unit =
    partials(batch, spec).write.mode("overwrite").parquet(path)

  /** Incremental refresh: aggregate ONLY the delta, append its states.
    * Never rereads the store — O(batch) work. */
  def refresh(batch: DataFrame, spec: Spec, path: String): Unit =
    partials(batch, spec).write.mode("append").parquet(path)

  /** Idempotent refresh for at-least-once delivery (the streaming
    * face — [[graft.streaming.StreamingMatView]] calls this per
    * micro-batch): the batch's states land under `batch=<id>/`, and a
    * replayed id is detected by its commit marker and skipped — a
    * partially-written directory (crash mid-write) has no marker and
    * is safely overwritten. The marker is written by THIS method
    * (`_GRAFT_COMMITTED`, created only after the parquet write
    * returns), so exactly-once does not depend on the committer's
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs` conf; a
    * `_SUCCESS` file from stores written by earlier versions is still
    * honored. Parquet partition discovery surfaces the id as a
    * `batch` column, which merge-on-read ignores. Returns whether the
    * batch was applied. Compact only a QUIESCED store: compaction
    * drops the markers, so replays older than it would re-append. */
  def refreshOnce(batch: DataFrame, spec: Spec, path: String, batchId: Long): Boolean = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
    val fs  = dir.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(dir, "_GRAFT_COMMITTED")
    if (fs.exists(marker) || fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) false
    else {
      partials(batch, spec).write.mode("overwrite").parquet(dir.toString)
      fs.create(marker, true).close()
      true
    }
  }

  /** Merge-on-read: re-aggregate states by group (-Merge). */
  def read(spark: SparkSession, spec: Spec, path: String): DataFrame = {
    val st = spark.read.parquet(path)
    st.groupBy(spec.groupCols.map(col): _*)
      .agg(spec.merges.head._2(spec.merges.head._1).as(spec.merges.head._1),
           spec.merges.tail.map { case (n, f) => f(n).as(n) }: _*)
  }

  /** Background-merge analog (MergeTree part merge): collapse all
    * parts to ONE state row per group, keeping states states. Valid
    * whenever each merge output is itself a state of the same kind —
    * true for count/sum/min/max (their merges are closed); HLL columns
    * stay sketches by unioning WITHOUT the terminal estimate. Reads
    * before and after compaction are identical; part count drops to
    * one file set. */
  def compact(spark: SparkSession, spec: Spec, path: String): Unit = {
    val st = spark.read.parquet(path)
    def mergeAsState(n: String): Column = st.schema(n).dataType match {
      case org.apache.spark.sql.types.BinaryType => hll_union_agg(col(n))
      case _ => spec.merges.find(_._1 == n).get._2(n)
    }
    val collapsed = st.groupBy(spec.groupCols.map(col): _*)
      .agg(mergeAsState(spec.states.head._1).as(spec.states.head._1),
           spec.states.tail.map { case (n, _) => mergeAsState(n).as(n) }: _*)
      .cache()
    collapsed.count() // materialize before overwriting the source files
    collapsed.write.mode("overwrite").parquet(path)
    collapsed.unpersist()
  }
}
