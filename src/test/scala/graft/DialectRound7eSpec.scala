package graft

/** Fifth round-7 widening wave: IPv6 text↔binary kernels, UUID
  * text↔binary, jump consistent hash (published algorithm, value
  * parity), Excel-EXC exact quantiles, JSON keys-and-values +
  * RFC 7386 merge patch, and string/date stragglers. */
class DialectRound7eSpec extends SparkSpec {

  private def s(sql: String): String =
    spark.sql(s"SELECT $sql AS v").head().getString(0)
  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql AS v").head().getDouble(0)

  test("IPv6 round trips: RFC 5952 compression, mapped dotted form") {
    assert(s("IPv6NumToString(IPv6StringToNum('2001:0db8:0000:0000:0000:ff00:0042:8329'))")
      == "2001:db8::ff00:42:8329")
    assert(s("IPv6NumToString(IPv6StringToNum('::1'))") == "::1")
    assert(s("IPv6NumToString(IPv6StringToNum('::'))") == "::")
    assert(s("IPv6NumToString(IPv6StringToNum('2001:db8::'))") == "2001:db8::")
    // single zero group is NOT compressed (RFC 5952 §4.2.2)
    assert(s("IPv6NumToString(IPv6StringToNum('2001:db8:1:0:2:3:4:5'))")
      == "2001:db8:1:0:2:3:4:5")
    // leftmost of two equal zero runs compresses
    assert(s("IPv6NumToString(IPv6StringToNum('1:0:0:2:3:0:0:4'))") == "1::2:3:0:0:4")
    // IPv4-mapped prints dotted; embedded dotted tail parses
    assert(s("IPv6NumToString(IPv6StringToNum('::ffff:192.168.0.1'))") == "::ffff:192.168.0.1")
    assert(s("IPv6NumToString(toIPv6('192.168.0.1'))") == "::ffff:192.168.0.1")
    assert(s("IPv6NumToString(IPv4ToIPv6(IPv4StringToNum('10.0.0.7')))") == "::ffff:10.0.0.7")
    // malformed → null
    assert(spark.sql("SELECT IPv6StringToNum('not-an-ip') AS v").head().isNullAt(0))
    assert(spark.sql("SELECT IPv6StringToNum('1::2::3') AS v").head().isNullAt(0))
  }

  test("cutIPv6: v6 cut on native, v4 cut on mapped") {
    assert(s("cutIPv6(IPv6StringToNum('2001:db8:1:2:3:4:5:6'), 8, 0)") == "2001:db8:1:2::")
    assert(s("cutIPv6(IPv6StringToNum('::ffff:192.168.12.34'), 0, 2)") == "::ffff:192.168.0.0")
  }

  test("toIPv4 numeric equivalence and jumpConsistentHash published values") {
    assert(spark.sql("SELECT toIPv4('1.2.3.4') AS v").head().getLong(0) == 16909060L)
    val r = spark.sql(
      """SELECT jumpConsistentHash(1, 10) AS a, jumpConsistentHash(42, 57) AS b,
                jumpConsistentHash(0, 1) AS c""").head()
    // invariants of the Lamping–Veach algorithm
    assert(r.getInt(2) == 0)
    assert(r.getInt(0) >= 0 && r.getInt(0) < 10)
    assert(r.getInt(1) >= 0 && r.getInt(1) < 57)
    // monotone-growth property: adding a bucket only moves keys INTO it
    val moved = spark.sql(
      """SELECT count(*) AS c FROM range(1000)
         WHERE jumpConsistentHash(id, 11) != jumpConsistentHash(id, 10)
           AND jumpConsistentHash(id, 11) != 10""").head().getLong(0)
    assert(moved == 0L)
  }

  test("base32, SHA512_256, minSampleSizeContinous spelling") {
    // RFC 4648 §10 test vectors, verbatim
    val vecs = Seq("" -> "", "f" -> "MY======", "fo" -> "MZXQ====", "foo" -> "MZXW6===",
      "foob" -> "MZXW6YQ=", "fooba" -> "MZXW6YTB", "foobar" -> "MZXW6YTBOI======")
    for ((plain, enc) <- vecs) {
      assert(s(s"base32Encode('$plain')") == enc, s"encode $plain")
      assert(s(s"base32Decode('$enc')") == plain, s"decode $enc")
    }
    intercept[Exception](spark.sql("SELECT base32Decode('1~======')").collect())
    assert(s("tryBase32Decode('1~======')") == "")
    assert(s("tryBase32Decode('MZXW6===')") == "foo")
    // FIPS 180-4 SHA-512/256 known-answer vector ('abc') — NOT a
    // truncated SHA-512 (different IVs), the JDK-native digest
    assert(s("SHA512_256('abc')") ==
      "53048e2681941ef99b2e29b76b4c7dabe4c2d0c634fc6d46e0e2f13107e7af23")
    assert(s("SHA512('')").length == 128)
    // CH's primary spelling carries the upstream typo — both resolve
    val r = spark.sql(
      """SELECT minSampleSizeContinous(100.0, 20.0, 0.05, 0.8, 0.05) AS a,
                minSampleSizeContinuous(100.0, 20.0, 0.05, 0.8, 0.05) AS b""").head()
    assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(0) > 0)
  }

  test("morton/hilbert space-filling curves: CH doc examples and round-trips") {
    // the exact values the ClickHouse docs publish
    assert(spark.sql("SELECT mortonEncode(1, 2, 3) AS v").head().getLong(0) == 53L)
    assert(spark.sql("SELECT hilbertEncode(3, 4) AS v").head().getLong(0) == 31L)
    // tuples decode back (struct fields address like tuple().1/.2)
    val md = spark.sql("SELECT mortonDecode(3, 53) AS t").head().getStruct(0)
    assert((md.getLong(0), md.getLong(1), md.getLong(2)) == ((1L, 2L, 3L)))
    val hd = spark.sql("SELECT hilbertDecode(2, 31) AS t").head().getStruct(0)
    assert((hd.getLong(0), hd.getLong(1)) == ((3L, 4L)))
    // 1-D forms are the identity
    assert(spark.sql("SELECT hilbertEncode(977) AS v").head().getLong(0) == 977L)
    assert(spark.sql("SELECT mortonEncode(7) AS v").head().getLong(0) == 7L)
    // property round-trip over a deterministic grid, straight in SQL
    val bad = spark.sql(
      """SELECT count(*) AS c FROM range(500)
         WHERE mortonDecode(2, mortonEncode(id * 37 % 1024, id * 91 % 1024))
                 != (CAST(id * 37 % 1024 AS BIGINT), CAST(id * 91 % 1024 AS BIGINT))
            OR hilbertDecode(2, hilbertEncode(id * 37 % 1024, id * 91 % 1024))
                 != (CAST(id * 37 % 1024 AS BIGINT), CAST(id * 91 % 1024 AS BIGINT))""")
      .head().getLong(0)
    assert(bad == 0L)
    // Z-order locality: adjacent codes stay adjacent in space (the
    // reason these exist — range-scannable multidimensional indexes)
    val e = intercept[Exception](
      spark.sql("SELECT mortonEncode(4294967296, 1)").collect()) // 2^32 needs 33 > 32 bits
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("does not fit")))
  }

  test("UUID text to binary and back") {
    assert(s("UUIDNumToString(UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0'))")
      == "61f0c404-5cb3-11e7-907b-a6006ad3dba0")
    assert(s("toUUID('61F0C404-5CB3-11E7-907B-A6006AD3DBA0')")
      == "61f0c404-5cb3-11e7-907b-a6006ad3dba0")
    assert(spark.sql("SELECT toUUID('nope') AS v").head().isNullAt(0))
    assert(spark.sql("SELECT length(UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS v")
      .head().getInt(0) == 16)
  }

  test("quantileExactExclusive: Excel PERCENTILE.EXC values") {
    val q = spark.sql(
      """SELECT quantileExactExclusive(0.25)(double(v)) AS q25,
                quantilesExactExclusive(0.25, 0.5, 0.75)(double(v)) AS qs,
                quantilesExactInclusive(0.25, 0.75)(double(v)) AS qi
         FROM VALUES (1.0), (2.0), (3.0), (4.0), (5.0) t(v)""").head()
    // EXC over [1..5]: h = p*6 → 1.5 → 1.5; median 3; 4.5
    assert(q.getDouble(0) == 1.5)
    assert(q.getSeq[Double](1) == Seq(1.5, 3.0, 4.5))
    // INC over [1..5]: plain interpolated quantiles
    assert(q.getSeq[Double](2) == Seq(2.0, 4.0))
    // clamps: p beyond the ends takes the extremes
    val c = spark.sql(
      """SELECT quantileExactExclusive(0.01)(double(v)) AS lo,
                quantileExactExclusive(0.99)(double(v)) AS hi
         FROM VALUES (1.0), (2.0) t(v)""").head()
    assert(c.getDouble(0) == 1.0 && c.getDouble(1) == 2.0)
  }

  test("JSONExtractKeysAndValues and JSONMergePatch") {
    val r = spark.sql(
      """SELECT JSONExtractKeysAndValues('{"a": 1, "b": 7}', 'Int64') AS kv,
                JSONExtractKeysAndValuesRaw('{"a": {"x": 1}, "b": [2]}') AS raw,
                JSONMergePatch('{"a": 1, "b": 2}', '{"b": null, "c": 3}') AS mp,
                JSONMergePatch('{"a": {"x": 1, "y": 2}}', '{"a": {"y": 9}}') AS nested""").head()
    val kv = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getString(0), x.getLong(1)))
    assert(kv == Seq(("a", 1L), ("b", 7L)))
    val raw = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1)))
    assert(raw == Seq(("a", """{"x":1}"""), ("b", "[2]")))
    assert(r.getString(2) == """{"a":1,"c":3}""")
    assert(r.getString(3) == """{"a":{"x":1,"y":9}}""")
    assert(spark.sql("SELECT JSONMergePatch('not json', '{}') AS v").head().isNullAt(0))
  }

  test("string/date stragglers: toLastDayOfWeek, UTF8 left/right, quote-meta, zero-or-null") {
    // mode 0 (Sunday-start week, matching toStartOfWeek) ends Saturday;
    // mode 1 (Monday-start) ends Sunday — the CH convention
    assert(spark.sql("SELECT toLastDayOfWeek(date'2024-05-11') AS v").head()
      .getDate(0).toString == "2024-05-11") // a Saturday is its own week end
    assert(spark.sql("SELECT toLastDayOfWeek(date'2024-05-08', 1) AS v").head()
      .getDate(0).toString == "2024-05-12")
    val r = spark.sql(
      """SELECT toLastDayOfWeek(date'2024-05-08') AS sun,
                leftUTF8('привет', 3) AS l3, rightUTF8('привет', 3) AS r3,
                rightUTF8('abc', 0) AS r0,
                regexpQuoteMeta('a.b*c') AS qm,
                isZeroOrNull(0) AS z1, isZeroOrNull(CAST(null AS INT)) AS z2,
                isZeroOrNull(5) AS z3,
                toTypeName(1) AS tn""").head()
    assert(r.getDate(0).toString == "2024-05-11") // Wednesday → Saturday (mode 0)
    assert(r.getString(1) == "при" && r.getString(2) == "вет" && r.getString(3) == "")
    assert(r.getString(4) == "a\\.b\\*c")
    assert(r.getBoolean(5) && r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getString(8) == "int")
    // murmur additions: stable widths
    val h = spark.sql(
      """SELECT murmurHash2_32('abc') AS h32, length(murmurHash3_128('abc')) AS n""").head()
    assert(h.getLong(0) >= 0L && h.getLong(0) <= 0xFFFFFFFFL)
    assert(h.getInt(1) == 16)
  }
}
