package graft

/** Two-phase State→Merge must equal the one-shot aggregate — the
  * AggregatingMergeTree contract ClickHouse materialized views rely
  * on. Each case aggregates partials per sub-group (the "parts"),
  * then merges across, and compares to the direct aggregate. */
class StateMergeRound7Spec extends SparkSpec {

  private def twoPhaseEqualsDirect(stateSql: String, mergeSql: String,
                                   directSql: String): Unit = {
    spark.sql(
      """SELECT id % 7 AS part, id % 3 AS k, CAST(id % 13 AS DOUBLE) AS v,
              CAST(id AS DOUBLE) AS uv, concat('u', id % 5) AS s
         FROM range(200)""").createOrReplaceTempView("sm_rows")
    val merged = spark.sql(
      s"""SELECT k, $mergeSql AS r FROM (
            SELECT part, k, $stateSql AS st FROM sm_rows GROUP BY part, k
          ) GROUP BY k ORDER BY k""").collect()
    val direct = spark.sql(
      s"SELECT k, $directSql AS r FROM sm_rows GROUP BY k ORDER BY k").collect()
    assert(merged.map(_.toString).toSeq == direct.map(_.toString).toSeq,
      s"\nmerged: ${merged.mkString(", ")}\ndirect: ${direct.mkString(", ")}")
  }

  test("argMax/argMin survive the state round trip (unique ordering key)") {
    // ties on the ordering value are CH-unspecified — the contract
    // holds where argMax is well-defined, so the key is unique here
    twoPhaseEqualsDirect("argMaxState(s, uv)", "argMaxMerge(st)", "argMax(s, uv)")
    twoPhaseEqualsDirect("argMinState(s, uv)", "argMinMerge(st)", "argMin(s, uv)")
  }

  test("quantile/median survive the state round trip (exact interpolation)") {
    twoPhaseEqualsDirect("quantileState(v)", "quantileMerge(0.5)(st)", "quantileExact(0.5)(v)")
    twoPhaseEqualsDirect("medianState(v)", "medianMerge(st)", "median(v)")
    twoPhaseEqualsDirect("quantileState(v)", "quantileMerge(0.9)(st)", "quantileExact(0.9)(v)")
  }

  test("groupArray/groupUniqArray merge as sorted multisets") {
    twoPhaseEqualsDirect("groupArrayState(v)", "array_sort(groupArrayMerge(st))",
      "array_sort(groupArray(v))")
    twoPhaseEqualsDirect("groupUniqArrayState(v)", "array_sort(groupUniqArrayMerge(st))",
      "array_sort(groupUniqArray(v))")
  }

  test("sumMap and bitwise aggregates merge exactly") {
    twoPhaseEqualsDirect("sumMapState(array(s), array(CAST(v AS BIGINT)))", "sumMapMerge(st)",
      "sumMap(array(s), array(CAST(v AS BIGINT)))")
    twoPhaseEqualsDirect("groupBitAndState(CAST(v AS BIGINT))", "groupBitAndMerge(st)",
      "groupBitAnd(CAST(v AS BIGINT))")
    twoPhaseEqualsDirect("groupBitOrState(CAST(v AS BIGINT))", "groupBitOrMerge(st)",
      "groupBitOr(CAST(v AS BIGINT))")
    twoPhaseEqualsDirect("groupBitXorState(CAST(v AS BIGINT))", "groupBitXorMerge(st)",
      "groupBitXor(CAST(v AS BIGINT))")
  }

  test("SimpleState spellings and quantileIf/medianIf") {
    twoPhaseEqualsDirect("maxSimpleState(v)", "max(st)", "max(v)")
    twoPhaseEqualsDirect("sumSimpleState(v)", "sum(st)", "sum(v)")
    val r = spark.sql(
      """SELECT quantileIf(0.5)(double(v), v < 3) AS q, medianIf(double(v), v < 3) AS m
         FROM VALUES (1.0), (2.0), (10.0), (20.0) t(v)""").head()
    assert(r.getDouble(0) == 1.5 && r.getDouble(1) == 1.5)
    val e = intercept[Exception](
      spark.sql("SELECT windowFunnelMerge(1) FROM VALUES (1) t(x)").collect())
    assert(e.getMessage.contains("re-aggregate"))
  }

  test("-Array combinator tail and uniqExact state pair") {
    val r = spark.sql(
      """SELECT maxArray(a) AS mx, minArray(a) AS mn, countArray(a) AS cnt,
                uniqArray(a) AS uq
         FROM VALUES (array(1, 5)), (array(2)), (array()), (array(5, 0)) t(a)""").head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 0)
    assert(r.getLong(2) == 5L && r.getLong(3) == 4L)
    twoPhaseEqualsDirect("uniqExactState(v)", "uniqExactMerge(st)", "uniqExact(v)")
    val e = intercept[Exception](
      spark.sql("SELECT quantileTDigestState(double(x)) FROM VALUES (1) t(x)").collect())
    assert(e.getMessage.contains("quantileState"))
  }
}
