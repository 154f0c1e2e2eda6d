package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (document, LSH-chunk) membership row entering the streaming
  * near-dedup state: `ck` packs (chunk index, chunk value) into one
  * long key, `id` is the arrival-ordered ingest id, `fp` the full
  * SimHash fingerprint for the exact verify. */
final case class ChunkDoc(ck: Long, id: Long, fp: Long)

/** A near-duplicate hit: `id` arrived after `earlier` and is within
  * `hamming` of it. A document may be reported through several chunk
  * buckets; consumers take `DISTINCT id` (or min(earlier)). */
final case class NearHit(id: Long, earlier: Long, hamming: Int)

/** Per-bucket state: every (id, fp) seen in this chunk bucket, packed
  * as two parallel arrays for a compact state-store encoding. */
final case class BucketSeen(ids: Array[Long], fps: Array[Long])

/** Continuous NEAR-duplicate detection for streaming ingestion — the
  * streaming face of [[graft.operators.Dedup.simHashPairs]]: a
  * document is flagged when an EARLIER-ARRIVED document lies within
  * `maxHamming` of its SimHash fingerprint, across micro-batches.
  * This is the crawler front door one step past [[StreamDedup]]:
  * boilerplate re-renders and lightly-edited re-crawls don't hash
  * equal, but they do land within a few SimHash bits.
  *
  * Mechanics: upstream explodes each doc into (maxHamming+1) chunk
  * keys of its fingerprint (pigeonhole: a pair within hamming d
  * agrees exactly on ≥1 of d+1 chunks, so chunk-equality candidates
  * are EXACT — no recall loss); this operator keys state by chunk
  * value and verifies XOR-popcount inside the bucket. Per bucket the
  * state is every seen (id, fp) — 16 bytes per doc per chunk, capped
  * at `maxBucket` (the same whale discipline as the batch operator:
  * run exact dedup FIRST so verbatim floods never reach here).
  *
  * Arbitration contract: "earlier" means smaller ingest id, and ids
  * must be assigned in arrival order (the [[StreamDedup]] q106
  * convention — re-deliveries get fresh, larger ids). Within a batch
  * the group is processed in id order, so replays produce the
  * identical hit set; the DuckDB oracle replays the whole thing as
  * "∃ smaller-id doc within hamming" over the union of batches.
  *
  * At 100 TB: state is O(docs × (d+1)) × 16 B, hash-partitioned by
  * chunk value (one shuffle); the RocksDB state backend is the
  * memory knob (SURVEY §4), and watermark+TTL bounds the horizon the
  * same way it does for exact streaming dedup.
  */
object StreamNearDedup {

  /** Explode an (id, fp) frame into the (maxHamming + 1) chunk
    * memberships [[nearHitsPerChunk]] keys its state by. Lives HERE —
    * next to the operator whose pigeonhole guarantee it carries — so
    * a caller can't silently raise maxHamming without the chunk count
    * following (d flipped bits touch ≤ d of the d+1 chunks, so ≥ 1
    * chunk survives intact; fewer chunks = silent recall loss).
    * Chunk widths split `bits` evenly, wider chunks first, the Manku
    * convention of the batch operator. */
  def explodeChunks(df: org.apache.spark.sql.DataFrame, maxHamming: Int,
                    bits: Int = 60)(
      implicit cEnc: Encoder[ChunkDoc]): Dataset[ChunkDoc] = {
    import org.apache.spark.sql.functions._
    require(maxHamming >= 1 && maxHamming + 1 <= bits,
      s"maxHamming $maxHamming needs ${maxHamming + 1} non-empty chunks of a $bits-bit fingerprint")
    val chunks = maxHamming + 1
    val widths = (0 until chunks).map(c => bits / chunks + (if (c < bits % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    df.select(explode(array((0 until chunks).map(c =>
        struct((lit(c.toLong) * (1L << widths.max) +
            shiftright(col("fp"), offsets(c)).bitwiseAND(lit((1L << widths(c)) - 1))).as("ck"),
          col("id"), col("fp"))): _*)).as("x"))
      .select(col("x.ck"), col("x.id"), col("x.fp"))
      .as[ChunkDoc]
  }

  def nearHitsPerChunk(docs: Dataset[ChunkDoc], maxHamming: Int,
                       maxBucket: Int = 4096)(
      implicit hEnc: Encoder[NearHit]): Dataset[NearHit] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.ck)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (ck: Long, it: Iterator[ChunkDoc], state: GroupState[BucketSeen]) => {
          val seen = state.getOption.getOrElse(BucketSeen(Array.empty, Array.empty))
          var ids = seen.ids
          var fps = seen.fps
          var n = ids.length
          val batch = it.toArray.sortBy(_.id) // id order == arrival order
          val out = Seq.newBuilder[NearHit]
          for (d <- batch) {
            // exact verify against every earlier doc in this bucket;
            // report the SMALLEST matching earlier id (deterministic).
            // A found flag, not a -1 sentinel: ingest ids may be
            // negative, and a negative match must still emit.
            var found = false
            var bestId = 0L
            var bestH = maxHamming + 1
            var i = 0
            while (i < n) {
              if (ids(i) < d.id) {
                val h = java.lang.Long.bitCount(fps(i) ^ d.fp)
                if (h <= maxHamming && (!found || ids(i) < bestId)) {
                  found = true; bestId = ids(i); bestH = h
                }
              }
              i += 1
            }
            if (found) out += NearHit(d.id, bestId, bestH)
            if (n < maxBucket) {
              if (n == ids.length) {
                val grow = math.max(8, n * 2)
                ids = java.util.Arrays.copyOf(ids, grow)
                fps = java.util.Arrays.copyOf(fps, grow)
              }
              ids(n) = d.id; fps(n) = d.fp; n += 1
            }
          }
          state.update(BucketSeen(
            java.util.Arrays.copyOf(ids, n), java.util.Arrays.copyOf(fps, n)))
          out.result().iterator
        })
  }
}
