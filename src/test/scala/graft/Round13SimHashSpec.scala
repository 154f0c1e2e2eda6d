package graft

import graft.operators.Dedup

/** Round 13 (continued): SimHash candidate generation moves from the
  * fixed 4×16-bit chunk scheme to Manku block combinations with the
  * block count auto-dialed from the corpus count — the sf100
  * full-registry rehearsal measured the fixed dial at 51× its sf10
  * time for 10× data (quadratic bucket occupancy on 16-bit keys).
  * The scheme is EXACT at every block count (pigeonhole on ≤ d
  * differing blocks), so the dial trades only cost, never recall. */
class Round13SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("autoSimHashBlocks: widens the packed key with the corpus, clamped") {
    // minimum dial (blocks = d+1 = 4, 16-bit keys) up to ~4M docs
    assert(Dedup.autoSimHashBlocks(0) == 4)
    assert(Dedup.autoSimHashBlocks(1) == 4)
    assert(Dedup.autoSimHashBlocks(100000) == 4)
    assert(Dedup.autoSimHashBlocks(64L * 65536) == 4) // needed = exactly 16 bits
    // sf100's 5M docs: 17 needed bits > 16 -> 5 blocks (25-bit keys)
    assert(Dedup.autoSimHashBlocks(5000000) == 5)
    // a billion docs still fits 5 blocks' 25-bit keys? needed = 24 -> yes
    assert(Dedup.autoSimHashBlocks(1000000000L) == 5)
    // clamp: even Long.MaxValue stays within d+9 blocks
    assert(Dedup.autoSimHashBlocks(Long.MaxValue) == 12)
    // the guarantee floor follows maxHamming
    assert(Dedup.autoSimHashBlocks(5000000, maxHamming = 1) == 2)
    assert(Dedup.autoSimHashBlocks(1, maxHamming = 6) == 7)
    // monotone in N
    val dials = Seq(1L, 1000L, 1000000L, 1000000000L, Long.MaxValue)
      .map(Dedup.autoSimHashBlocks(_))
    assert(dials == dials.sorted)
  }

  private def fixture() = {
    val rnd = new scala.util.Random(43L)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = Seq.tabulate(40) { i =>
      (0 until 30).map(j => words(rnd.nextInt(words.length))).mkString(" ")
    }
    // exact dups + one-word edits + unrelated docs: hamming spectrum
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      val edit = t.split(" ").updated(3, "edited").mkString(" ")
      Seq((i * 3L, t), (i * 3L + 1, t), (i * 3L + 2, edit))
    }
    docs.toDF("doc_id", "norm")
  }

  test("simHashPairs is dial-independent: blocks 4, 5, 7 give identical pairs") {
    val docs = fixture()
    def pairs(b: Int) = Dedup.simHashPairs(docs, "doc_id", "norm",
        maxHamming = 3, blocks = b)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    val p4 = pairs(4)
    assert(p4.nonEmpty, "fixture must produce near-dup pairs")
    assert(p4.exists(_._3 == 0L), "exact dups must appear at hamming 0")
    assert(pairs(5) == p4)
    assert(pairs(7) == p4)
  }

  test("simHashPairsAuto: dial observable, result equals the explicit dial") {
    val docs = fixture()
    val auto = Dedup.simHashPairsAuto(docs, "doc_id", "norm", maxHamming = 3)
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = auto.queryExecution.observedMetrics("graft_simhash_dial")
    val n = m.getAs[Long]("corpus_n")
    val blocks = m.getAs[Int]("blocks")
    assert(n == docs.count())
    assert(blocks == Dedup.autoSimHashBlocks(n))
    val explicit = Dedup.simHashPairs(docs, "doc_id", "norm",
        maxHamming = 3, blocks = blocks)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == explicit)
  }

  test("substringDedupStats (shingle-hash kernel) matches brute-force window-text dedup") {
    val rnd = new scala.util.Random(46L)
    val words = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold", "rust")
    val boiler = (0 until 12).map(j => words(rnd.nextInt(words.length))).mkString(" ")
    val docs = (0L until 30L).map { i =>
      val own = (0 until 20).map(j => words(rnd.nextInt(words.length))).mkString(" ")
      // half the docs embed the shared boilerplate span
      (i, if (i % 2 == 0) s"$own $boiler" else own)
    }
    val w = 8
    // brute force in plain Scala: group positions by window TEXT
    val wins = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      if (t.length < w) Seq.empty
      else (0 to t.length - w).map(p => (t.slice(p, p + w).mkString(" "), id, p + 1))
    }
    val removable = wins.groupBy(_._1).values.flatMap { occ =>
      occ.sortBy(o => (o._2, o._3)).drop(1)
    }.toSeq.map(o => (o._2, o._3))
    val expected = removable.groupBy(_._1).map { case (id, ps) =>
      val pos = ps.map(_._2).sorted
      val covered = pos.zipAll(pos.drop(1).map(Some(_)), 0, None).map {
        case (p, Some(n)) => math.min(n - p, w)
        case (p, _) => w
        case _ => 0
      }.sum
      (id, ps.size.toLong, covered.toLong)
    }
    val got = Dedup.substringDedupStats(
        docs.toDF("doc_id", "norm"), "doc_id", "norm", w)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expected.map(_._1).toSet)
    expected.foreach { case (id, dw, cov) =>
      assert(got(id) == ((dw, cov)), s"doc $id")
    }
    assert(expected.nonEmpty, "fixture must produce duplicate spans")
  }

  test("simHashPairs refuses a dial below the pigeonhole floor") {
    val docs = fixture()
    intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, "doc_id", "norm", maxHamming = 3, blocks = 3)
    }
  }

  test("maxHamming 0 refuses with a pointer to exact dedup (1-block mask would overflow)") {
    val docs = fixture()
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, "doc_id", "norm", maxHamming = 0, blocks = 1)
    }
    assert(e.getMessage.contains("Dedup.exact"))
    intercept[IllegalArgumentException] { Dedup.autoSimHashBlocks(1000, maxHamming = 0) }
  }

  test("substringDedupStats canonicalizes whitespace: split-count and kernel tokens agree") {
    // doubled spaces: split(' ') would count 4 tokens, the kernel's
    // non-space runs count 3 — pre-fix these docs passed the >=4
    // filter and emitted whole-doc fallback hashes as fake windows
    val docs = Seq((1L, "a b  c"), (2L, "a  b c")).toDF("doc_id", "norm")
    val got = Dedup.substringDedupStats(docs, "doc_id", "norm", w = 4).collect()
    assert(got.isEmpty, s"3-token docs must not report 4-token windows: ${got.mkString}")
    // and a real duplicate window still reports under messy whitespace
    val dup = Seq((1L, "x  y z w  q"), (2L, " x y  z w r")).toDF("doc_id", "norm")
    val rows = Dedup.substringDedupStats(dup, "doc_id", "norm", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toList
    assert(rows == List((2L, 1L, 4L, 5)))
  }
}
