package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incoming document: `fp` is its content fingerprint (e.g.
  * [[graft.operators.TextAnalysis.fingerprint]] — md5 of normalized
  * text), `id` a unique ingest id used for deterministic
  * first-wins arbitration inside a batch. */
final case class Doc[V](fp: String, id: Long, value: V)

/** Continuous exact deduplication for streaming ingestion — the
  * streaming face of [[graft.operators.Dedup.exact]]: the first
  * document per content fingerprint passes, every later duplicate is
  * dropped, across batches. This is the training-data front door: a
  * crawler re-delivering the same page (at-least-once sources,
  * re-crawls) must not re-enter the corpus.
  *
  * State per fingerprint is the winning ingest id only — O(distinct
  * docs) × ~few bytes, hash-partitioned by fingerprint (one shuffle).
  * Within a batch ties break on min id, so replays and reorderings
  * produce the identical survivor set — the spec pins equality with
  * the batch operator run on the union of all batches.
  *
  * At 100 TB scale the fingerprint state outgrows memory eventually;
  * the deployment answer is watermark + TTL (pass
  * `GroupStateTimeout.ProcessingTimeTimeout` and expire cold
  * fingerprints) once the dedup horizon is bounded — the semantics
  * here stay the same, so the spec's contract still holds within the
  * horizon.
  */
object StreamDedup {

  def firstPerFingerprint[V](docs: Dataset[Doc[V]])(
      implicit dEnc: Encoder[Doc[V]], sEnc: Encoder[String],
      lEnc: Encoder[Long]): Dataset[Doc[V]] =
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (fp: String, it: Iterator[Doc[V]], state: GroupState[Long]) => {
          if (state.exists) Iterator.empty // fingerprint already admitted
          else {
            var best: Doc[V] = null
            for (d <- it) if (best == null || d.id < best.id) best = d
            if (best == null) Iterator.empty
            else { state.update(best.id); Iterator.single(best) }
          }
        })
}
