package graft

/** Round 16: ALTER-interleaving fuzz for the engine record — the
  * round-15 verdict's item 7. Random sequences of MODIFY ORDER BY /
  * MODIFY SETTING / RESET SETTING / MODIFY TTL / REMOVE TTL /
  * ADD-DROP PROJECTION / ALTER DELETE / ALTER UPDATE / OPTIMIZE
  * against a MODEL of the expected manifest, asserting after every
  * sequence that SHOW CREATE TABLE reflects exactly the model (the
  * swapInPlace clause-preservation class of bug, caught once already
  * in q98c, cannot recur silently), and periodically that the shown
  * DDL stays RE-EXECUTABLE (fixpoint under a new name). ≥200 random
  * sequences; a fixed seed keeps failures reproducible. */
class Round16AlterFuzzSpec extends SparkSpec {

  private final case class Model(
      orderBy: String,
      settings: Map[String, String],
      ttl: Option[String],
      projections: Set[String])

  test("fuzz: 200 random ALTER interleavings never drop a manifest clause") {
    val rnd = new scala.util.Random(1601)
    val t = "fz_alter_t"
    val tb = "fz_alter_b"

    def recreate(): Model = {
      dropWithLocation(t)
      spark.sql(s"""CREATE TABLE $t (c0 Int64, c1 String, c2 Date, v Float64)
                    ENGINE = MergeTree PARTITION BY c1 ORDER BY c0
                    SETTINGS index_granularity = 8192""")
      // positional INSERT follows the CATALOG order — the partition
      // column c1 floats to the end of a partitioned table's schema
      spark.sql(s"""INSERT INTO $t
                    SELECT id, CAST('2123-01-01' AS DATE), CAST(id AS DOUBLE) / 2,
                           CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END
                    FROM range(60)""")
      Model("c0", Map("index_granularity" -> "8192"), None, Set.empty)
    }

    var model = recreate()
    var projSeq = 0
    var reexecs = 0

    def step(m: Model): Model = rnd.nextInt(10) match {
      case 0 =>
        val ob = if (rnd.nextBoolean()) "(c0, c1)" else "c0"
        spark.sql(s"ALTER TABLE $t MODIFY ORDER BY $ob")
        m.copy(orderBy = ob)
      case 1 =>
        val v = (1 + rnd.nextInt(8)) * 1024
        spark.sql(s"ALTER TABLE $t MODIFY SETTING index_granularity = $v")
        m.copy(settings = m.settings + ("index_granularity" -> v.toString))
      case 2 =>
        val v = 100 + rnd.nextInt(900)
        spark.sql(s"ALTER TABLE $t MODIFY SETTING parts_to_throw_insert = $v")
        m.copy(settings = m.settings + ("parts_to_throw_insert" -> v.toString))
      case 3 =>
        val k = if (rnd.nextBoolean()) "index_granularity" else "parts_to_throw_insert"
        spark.sql(s"ALTER TABLE $t RESET SETTING $k")
        m.copy(settings = m.settings - k)
      case 4 =>
        val days = 30 + rnd.nextInt(300)
        spark.sql(s"ALTER TABLE $t MODIFY TTL c2 + INTERVAL $days DAY")
        m.copy(ttl = Some(s"c2 + INTERVAL $days DAY"))
      case 5 =>
        spark.sql(s"ALTER TABLE $t REMOVE TTL")
        m.copy(ttl = None)
      case 6 =>
        // data rewrite through the partition-pruned mutate path — the
        // swap must preserve every manifest clause
        spark.sql(s"ALTER TABLE $t DELETE WHERE v < ${rnd.nextInt(3)}.5 AND c0 % 17 = ${rnd.nextInt(17)}")
        m
      case 7 =>
        spark.sql(s"ALTER TABLE $t UPDATE v = v + 1 WHERE c0 % ${2 + rnd.nextInt(5)} = 0")
        m
      case 8 =>
        if (m.projections.nonEmpty && rnd.nextBoolean()) {
          val p = m.projections.head
          spark.sql(s"ALTER TABLE $t DROP PROJECTION $p")
          m.copy(projections = m.projections - p)
        } else {
          projSeq += 1
          val p = s"p_fz$projSeq"
          spark.sql(s"ALTER TABLE $t ADD PROJECTION $p (SELECT c0, v ORDER BY v)")
          m.copy(projections = m.projections + p)
        }
      case 9 =>
        spark.sql(s"OPTIMIZE TABLE $t FINAL")
        m
    }

    def check(m: Model, seq: Int, trace: Seq[String]): Unit = {
      val shown = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
      def ctx = s"sequence $seq\ntrace: ${trace.mkString("; ")}\nshown:\n$shown"
      assert(shown.contains(s"ORDER BY ${m.orderBy}"), s"ORDER BY lost/wrong — $ctx")
      assert(shown.contains("PARTITION BY c1"), s"PARTITION BY dropped — $ctx")
      assert(shown.contains("ENGINE = MergeTree"), s"engine dropped — $ctx")
      for ((k, v) <- m.settings)
        assert(shown.contains(s"$k = $v"), s"setting $k=$v lost — $ctx")
      if (m.settings.isEmpty) assert(!shown.contains("SETTINGS"), s"stale SETTINGS — $ctx")
      m.ttl match {
        case Some(rule) => assert(shown.contains(s"TTL $rule"), s"TTL lost — $ctx")
        case None       => assert(!shown.contains("\nTTL "), s"stale TTL — $ctx")
      }
      for (p <- m.projections)
        assert(shown.contains(s"PROJECTION $p "), s"projection $p lost — $ctx")
      // settings that were reset must not linger
      val allKeys = Set("index_granularity", "parts_to_throw_insert")
      for (k <- allKeys -- m.settings.keySet)
        assert(!shown.contains(k), s"reset setting $k lingers — $ctx")
    }

    def reexecute(seq: Int): Unit = {
      dropWithLocation(tb)
      val shown = spark.sql(s"SHOW CREATE TABLE $t").head().getString(0)
      spark.sql(shown.replace(t, tb))
      val shownB = spark.sql(s"SHOW CREATE TABLE $tb").head().getString(0)
      assert(shownB == shown.replace(t, tb),
        s"sequence $seq: SHOW∘CREATE not a fixpoint after ALTERs\nA: $shown\nB: $shownB")
      assert(spark.table(tb).schema == spark.table(t).schema, s"sequence $seq: schema drift")
      dropWithLocation(tb)
    }

    val sequences = 200
    for (seq <- 0 until sequences) {
      // fresh table every ~25 sequences keeps mutation cost bounded
      // while most sequences run against accumulated prior state —
      // the interleavings the item is about
      if (seq % 25 == 0 && seq > 0) { model = recreate(); projSeq = 0 }
      val steps = 1 + rnd.nextInt(3)
      val trace = scala.collection.mutable.ArrayBuffer.empty[String]
      for (_ <- 0 until steps) {
        val before = model
        model = step(before)
        trace += (if (model eq before) "data-op" else "meta-op")
      }
      check(model, seq, trace.toSeq)
      if (seq % 20 == 19) { reexecute(seq); reexecs += 1 }
    }
    assert(reexecs >= 10)
    dropWithLocation(t)
  }
}
