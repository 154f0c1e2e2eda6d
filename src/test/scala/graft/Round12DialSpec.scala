package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round 12: the LSH plane dial and the IVF cell count default are
  * computed from the corpus count instead of trusting the caller to
  * have read the scaling audit. These specs pin the closed forms to
  * the dial values the sf0.1/sf1/sf10 candidate audit MEASURED
  * (docs/AUDIT_lsh_r11.md: planes=12 at the 200k-vector rehearsal
  * restores ~linear candidates) and check the auto entry points are
  * behavior-identical to the explicit-dial operators. */
class Round12DialSpec extends SparkSpec {
  import spark.implicits._

  test("autoPlanes: ceil(log2(N/target)), clamped, hits the audit-measured dials") {
    // the audit's corpus sizes: sf0.1 ≈ 2k vectors → 5 planes,
    // sf1 ≈ 20k → 9, sf10 ≈ 200k → 12 (the measured linear-restoring dial)
    assert(Similarity.autoPlanes(2000) == 5)
    assert(Similarity.autoPlanes(20000) == 9)
    assert(Similarity.autoPlanes(200000) == 12)
    // clamps: tiny corpora keep >= 4 planes, astronomic ones stop at 30
    assert(Similarity.autoPlanes(1) == 4)
    assert(Similarity.autoPlanes(0) == 4)
    assert(Similarity.autoPlanes(Long.MaxValue) == 30)
    // occupancy target is a real dial: doubling it drops one plane
    assert(Similarity.autoPlanes(200000, targetOccupancy = 128) == 11)
    // monotone in N — a bigger corpus never gets a coarser hash
    val dials = Seq(100L, 10000L, 1000000L, 100000000L).map(Similarity.autoPlanes(_))
    assert(dials == dials.sorted)
  }

  test("semanticDedupAuto equals explicit-planes semanticDedup at the computed dial") {
    val rnd = new scala.util.Random(3L)
    val base = Seq.tabulate(120) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    } ++ Seq((500L, Array.fill(16)(0.25f)), (501L, Array.fill(16)(0.25f)))
    val df = base.toDF("vec_id", "embedding")
    val n = df.count()
    val planes = Similarity.autoPlanes(n)
    val auto = Similarity.semanticDedupAuto(df, "vec_id", "embedding", dim = 16, minCos = 0.95)
      .orderBy("vec_id").collect().map(r => (r.getLong(1), r.getBoolean(2))).toSeq
    val explicit = Similarity.semanticDedup(df, "vec_id", "embedding",
      numPlanes = planes, dim = 16, minCos = 0.95)
      .orderBy("vec_id").collect().map(r => (r.getLong(1), r.getBoolean(2))).toSeq
    assert(auto == explicit)
    // the planted exact duplicate still dedups under the auto dial
    assert(auto.find(_._1 == 501L).exists(!_._2))
    assert(auto.find(_._1 == 500L).exists(_._2))
  }

  test("semanticDedupAuto exposes the chosen dial via the graft_lsh_dial metric") {
    val rnd = new scala.util.Random(9L)
    val df = Seq.tabulate(80) { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupAuto(df, "vec_id", "embedding", dim = 8, minCos = 0.99)
    out.collect() // materialize so the observation fires
    val m = out.queryExecution.observedMetrics("graft_lsh_dial")
    assert(m.getAs[Int]("planes") == Similarity.autoPlanes(80))
    assert(m.getAs[Long]("rows") == 80L)
    assert(m.getAs[Long]("buckets") > 0L)
  }

  test("lshAnnPairsAuto equals lshAnnPairs at the computed dial") {
    val rnd = new scala.util.Random(11L)
    val df = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val planes = Similarity.autoPlanes(100)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val auto = Similarity.lshAnnPairsAuto(df, "vec_id", "embedding",
      numTables = 4, minCos = 0.5, dim = 16).collect().map(key).toSet
    val explicit = Similarity.lshAnnPairs(df, "vec_id", "embedding",
      numPlanes = planes, numTables = 4, minCos = 0.5, dim = 16).collect().map(key).toSet
    assert(auto == explicit)
  }

  test("autoNlist: ~sqrt(N), clamped to the fit's row-per-cell budget") {
    assert(Similarity.autoNlist(400) == 20)
    assert(Similarity.autoNlist(10000) == 100)
    assert(Similarity.autoNlist(10) == 16)           // floor
    assert(Similarity.autoNlist(10_000_000_000L) == 6250) // 50000/8 cap
    assert(Similarity.autoNlist(10_000_000_000L, maxSample = 200000) == 25000)
  }

  test("ivfIndexAuto: default nlist prunes the probe scan at two corpus sizes") {
    for (n <- Seq(400, 2500)) {
      val rnd = new scala.util.Random(n.toLong)
      val base = Seq.tabulate(n) { i => (i.toLong, Array.fill(12)(rnd.nextFloat() * 2 - 1)) }
      val df = base.toDF("vec_id", "embedding")
      val (assigned, centers) = Similarity.ivfIndexAuto(df, "vec_id", "embedding")
      assert(centers.length == Similarity.autoNlist(n))
      val probe = base(7)._2.map(x => x + 0.005f)
      val nprobe = 3
      // the candidate set is the nprobe nearest cells only — the scan
      // fraction the auto nlist buys: ~nprobe/nlist of the corpus
      val cells = Similarity.nearestCells(probe.map(_.toDouble), centers, nprobe).toSet
      val cand = assigned.where(col("cell").isin(cells.toSeq: _*))
      val candN = cand.count()
      assert(candN < n, s"n=$n: probe scan must not cover the corpus")
      assert(cand.select("cell").distinct().collect().map(_.getInt(0)).toSet.subsetOf(cells))
      // recall: the planted near-dup of id 7 sits in the probed cells
      val top = Similarity.ivfTopK((assigned, centers), "vec_id", "embedding",
        probe, k = 1, nprobe = nprobe).head()
      assert(top.getLong(0) == 7L)
    }
  }
}
