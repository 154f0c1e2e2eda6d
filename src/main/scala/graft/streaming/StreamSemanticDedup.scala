package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (vector, LSH-bucket) row entering streaming semantic dedup:
  * `bucket` is the signed-hyperplane code (computed upstream with the
  * same closed-form planes as the batch operator), `id` the
  * arrival-ordered ingest id, `vec` the embedding widened to double. */
final case class VecDoc(bucket: Long, id: Long, vec: Array[Double])

/** A semantic near-duplicate hit: `id` arrived after `earlier` in the
  * same bucket with rounded cosine ≥ the threshold. */
final case class CosHit(id: Long, earlier: Long, cos: Double)

/** Per-bucket state: every (id, norm, vec) seen in this bucket. */
final case class BucketVecs(ids: Array[Long], norms: Array[Double],
                            vecs: Array[Array[Double]])

/** Continuous SEMANTIC dedup for streaming ingestion — the streaming
  * face of [[graft.operators.Similarity.semanticDedup]] (SemDeDup):
  * a vector is flagged when an earlier-arrived vector in the SAME
  * hyperplane bucket has cosine ≥ `minCos`. Completes the streaming
  * dedup trio: exact ([[StreamDedup]], q106), SimHash near-dup
  * ([[StreamNearDedup]], q106b), embedding-cosine (this, q106c).
  *
  * The predicate — "∃ smaller-id same-bucket vector with
  * round(cos, 4) ≥ τ" — is EXACTLY the batch operator's per-vector
  * survivorship, so with ids assigned in arrival order the streamed
  * verdicts equal batch semanticDedup over the union of batches, and
  * the DuckDB oracle replays the whole thing (closed-form integer
  * planes, double-precision index-order dot folds, 4-decimal
  * rounding) from first principles.
  *
  * Cosine arithmetic mirrors [[graft.plans.DotProduct]] bit for bit:
  * index-order double accumulation over min(len) elements, norms =
  * sqrt of the self-dot, `round` = HALF_UP at 4 decimals (Spark's
  * Round on doubles).
  *
  * At 100 TB: state carries the vectors themselves — dim doubles per
  * doc (the price of exact verification; int8-quantized variants
  * trade that off, q59) — hash-partitioned by bucket, capped at
  * `maxBucket` per bucket (whale discipline: run exact dedup first),
  * RocksDB-backed past memory (SURVEY §4). */
object StreamSemanticDedup {
  // The keyed-state skeleton (sorted batch, parallel-array growth,
  // smallest-earlier-id arbitration, maxBucket cap) deliberately
  // mirrors [[StreamNearDedup.nearHitsPerChunk]] rather than sharing
  // a generic helper: the two state payloads want DIFFERENT compact
  // encodings (two long arrays vs longs + norms + nested vectors),
  // and a payload-generic GroupState would trade that for encoder
  // indirection. Behavioral fixes must land in BOTH (see the
  // found-flag arbitration note there).

  /** Hyperplane-count dial for the UPSTREAM bucket coding this
    * operator keys on — delegates to
    * [[graft.operators.Similarity.autoPlanes]] (the batch dial: planes
    * = log₂(n / targetOccupancy), clamped [4, 30]) so a deployer
    * sizes the stream's bucket space from the corpus estimate instead
    * of pinning a constant. The 1M-vector rehearsal measured the
    * fixed-8-planes cliff this exists to prevent: 256 buckets →
    * ~3,900 vectors per bucket → the exact cosine verify goes
    * quadratic and CPU-bound (~92 s/1M); at the auto dial
    * (autoPlanes(1_000_000) = 14 → 16k buckets) occupancy stays ~64.
    * `expectedDocs` comes from the batch store the stream lands in
    * ([[graft.operators.Similarity.corpusCount]] is metadata-only on
    * parquet) or a capacity-planning estimate; re-bucketing an
    * ALREADY-RUNNING stream changes bucket identities, so pick for
    * the horizon the state is allowed to span (watermark/TTL), not
    * for day one. */
  def autoPlanes(expectedDocs: Long, targetOccupancy: Int = 64): Int =
    graft.operators.Similarity.autoPlanes(expectedDocs, targetOccupancy)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private[graft] def round4(x: Double): Double =
    BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  def hitsPerBucket(docs: Dataset[VecDoc], minCos: Double,
                    maxBucket: Int = 4096)(
      implicit hEnc: Encoder[CosHit]): Dataset[CosHit] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (bucket: Long, it: Iterator[VecDoc], state: GroupState[BucketVecs]) => {
          val seen = state.getOption.getOrElse(
            BucketVecs(Array.empty, Array.empty, Array.empty))
          var ids = seen.ids
          var norms = seen.norms
          var vecs = seen.vecs
          var n = ids.length
          val batch = it.toArray.sortBy(_.id) // id order == arrival order
          val out = Seq.newBuilder[CosHit]
          for (d <- batch) {
            val dn = math.sqrt(dot(d.vec, d.vec))
            var found = false // not a -1 sentinel: ids may be negative
            var bestId = 0L
            var bestCos = 0.0
            var i = 0
            while (i < n) {
              if (ids(i) < d.id) {
                // Batch parity for non-finite cosines (zero-norm /
                // overflowing vectors): Spark's round() passes
                // NaN/Infinity through unchanged and BOTH engines
                // order NaN GREATER than every value, so in batch
                // semanticDedup (and the DuckDB oracle) round(cos,4)
                // >= minCos is TRUE for NaN and +Inf, FALSE for
                // -Inf. Mirror that exactly; only finite values go
                // through BigDecimal rounding (which would throw on
                // non-finite input).
                val raw = dot(vecs(i), d.vec) / (norms(i) * dn)
                val c = if (raw.isNaN || raw.isInfinite) raw else round4(raw)
                val hit = raw.isNaN || c >= minCos
                if (hit && (!found || ids(i) < bestId)) {
                  found = true; bestId = ids(i); bestCos = c
                }
              }
              i += 1
            }
            if (found) out += CosHit(d.id, bestId, bestCos)
            if (n < maxBucket) {
              if (n == ids.length) {
                val grow = math.max(8, n * 2)
                ids = java.util.Arrays.copyOf(ids, grow)
                norms = java.util.Arrays.copyOf(norms, grow)
                vecs = java.util.Arrays.copyOf(vecs, grow)
              }
              ids(n) = d.id; norms(n) = dn; vecs(n) = d.vec; n += 1
            }
          }
          state.update(BucketVecs(
            java.util.Arrays.copyOf(ids, n),
            java.util.Arrays.copyOf(norms, n),
            java.util.Arrays.copyOf(vecs, n)))
          out.result().iterator
        })
  }
}
