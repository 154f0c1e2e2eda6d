package graft

import graft.plans.IpKernels
import org.apache.spark.unsafe.types.UTF8String

/** Seeded property checks for the round-7 kernels: IPv6 parse/format
  * round trips on random address bytes, arrayFill/arraySplit
  * reconstruction invariants, jump-hash distribution sanity, and
  * parseTimeDelta against a generated spelling. */
class Round7FuzzSpec extends SparkSpec {

  test("IPv6 format∘parse is the identity on 500 random addresses") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 500).foreach { i =>
      val b = new Array[Byte](16)
      rnd.nextBytes(b)
      // bias some addresses toward zero runs so compression paths fire
      if (i % 3 == 0) (0 until rnd.nextInt(12)).foreach(j => b(rnd.nextInt(16)) = 0)
      if (i % 7 == 0) { java.util.Arrays.fill(b, 0, 10, 0.toByte); b(10) = -1; b(11) = -1 }
      val text = IpKernels.bytesToIpv6(b)
      assert(text != null, s"format failed on ${b.mkString(",")}")
      val back = IpKernels.ipv6ToBytes(text)
      assert(back != null && java.util.Arrays.equals(back, b),
        s"round trip broke: ${b.mkString(",")} -> $text -> ${Option(back).map(_.mkString(",")) }")
    }
  }

  test("IPv6 parser accepts upper/mixed case and rejects malformed shapes") {
    val ok = IpKernels.ipv6ToBytes(UTF8String.fromString("2001:DB8::FF00:42:8329"))
    assert(ok != null)
    assert(IpKernels.bytesToIpv6(ok).toString == "2001:db8::ff00:42:8329")
    Seq(":::", "1:2:3:4:5:6:7", "1:2:3:4:5:6:7:8:9", "12345::", "g::1",
        "1.2.3.4.5", "::ffff:999.0.0.1").foreach { bad =>
      assert(IpKernels.ipv6ToBytes(UTF8String.fromString(bad)) == null, s"accepted '$bad'")
    }
  }

  test("arraySplit flattens back to the input; arrayFill keeps passing elements") {
    val rnd = new scala.util.Random(7L)
    (1 to 40).foreach { _ =>
      val n = rnd.nextInt(12)
      val arr = Seq.fill(n)(rnd.nextInt(5))
      val lit = if (arr.isEmpty) "CAST(array() AS ARRAY<INT>)"
                else arr.mkString("array(", ", ", ")")
      val r = spark.sql(
        s"""SELECT flatten(arraySplit(x -> x = 0, $lit)) AS fl,
                   flatten(arrayReverseSplit(x -> x = 0, $lit)) AS fr,
                   arrayFill(x -> x != 0, $lit) AS ff
            FROM (SELECT 1)""").head()
      assert(r.getSeq[Int](0) == arr, s"split lost elements on $arr")
      assert(r.getSeq[Int](1) == arr, s"reverseSplit lost elements on $arr")
      val filled = r.getSeq[Int](2)
      assert(filled.length == arr.length)
      // passing elements are fixed points; failures never introduce new values
      arr.zip(filled).foreach { case (orig, got) =>
        if (orig != 0) assert(got == orig)
        else assert(got == 0 || arr.contains(got))
      }
    }
  }

  test("jumpConsistentHash: full bucket coverage and bounded skew at 10k keys") {
    val counts = (0 until 10000).map(k => IpKernels.jumpConsistentHash(k.toLong * 2654435761L, 16))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == (0 until 16).toSet, s"missing buckets: ${(0 until 16).toSet -- counts.keySet}")
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < mn * 2, s"skew too high: min=$mn max=$mx")
  }

  test("parseTimeDelta inverts a generated unit spelling") {
    val rnd = new scala.util.Random(99L)
    (1 to 25).foreach { _ =>
      val d = rnd.nextInt(5); val h = rnd.nextInt(24); val m = rnd.nextInt(60); val s = rnd.nextInt(60)
      val expect = d * 86400 + h * 3600 + m * 60 + s
      val spelled = s"${d}d ${h}h ${m}min ${s}s"
      val got = spark.sql(s"SELECT parseTimeDelta('$spelled') AS v").head().getDouble(0)
      assert(got == expect.toDouble, s"'$spelled' -> $got, want $expect")
    }
  }

  test("literal lexer fuzz: bracket spelling equals array() spelling on random shapes") {
    val rnd = new scala.util.Random(424242L)
    (1 to 30).foreach { _ =>
      val n = 1 + rnd.nextInt(4)
      val vals = Seq.fill(n)(rnd.nextInt(100))
      val idx = rnd.nextInt(n)
      val bracketed = s"SELECT ${vals.mkString("[", ", ", "]")}[$idx] AS v"
      val spelled   = s"SELECT array(${vals.mkString(", ")})[$idx] AS v"
      assert(spark.sql(bracketed).head().getInt(0) == spark.sql(spelled).head().getInt(0),
        s"mismatch for $bracketed")
    }
    // brackets inside strings, backticks, and JSON paths are inert
    assert(spark.sql("SELECT get_json_object('{\"a\": [5, 6]}', '$.a[1]') AS v")
      .head().getString(0) == "6")
    assert(spark.sql("SELECT '[not][an][array]' AS v").head().getString(0) == "[not][an][array]")
    val r = spark.sql("SELECT 1 AS `weird[col]`")
    assert(r.columns.head == "weird[col]")
    // literals work in every clause position
    assert(spark.sql(
      "SELECT x FROM (SELECT explode([3, 1, 2]) AS x) WHERE x IN [1, 3] ORDER BY x")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 3))
  }
}
