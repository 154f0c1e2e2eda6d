package graft

import org.apache.spark.sql.Row

/** Round 18 — the vacuity gate. q95h was "hash-green" for a full round
  * on an EMPTY result (its filter matched zero rows at every SF), and
  * the round-18 profile sweep found the same class alive in six more
  * gates (q95, q95b, q95c, q28j, q40-group_size, q69-dup_gram5, q57b-
  * n_legs): empty==empty and constant==constant pass every hash check,
  * so rows+schema+hash equality alone cannot tell a gate that PROVES a
  * feature from one that silently never exercises it.
  *
  * This spec runs every registry query at the GATE scale factor
  * (sf0.01 — the same inputs the driver's DuckDB compare uses) and
  * asserts per-query EFFECT predicates: filled rows exist AND real
  * rows exist for the fill family, duplicate groups AND singletons for
  * dedup, matches for search/sequence, both branches for conditionals,
  * funnel/level structure, roundtrip invariants, approximation error
  * bounds. The name table is machine-locked to the registry — adding a
  * query without an effect assertion fails the suite (same discipline
  * as SurveyConsistencySpec).
  */
class VacuitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  // ---------------------------------------------------------- helpers

  private type Eff = (String, Array[Row] => Boolean)

  private def num(v: Any): Double = v match {
    case null => Double.NaN
    case b: Byte => b.toDouble
    case s: Short => s.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case f: Float => f.toDouble
    case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue()
    case d: scala.math.BigDecimal => d.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case _ => Double.NaN
  }
  private def vals(rs: Array[Row], c: String): Array[Any] =
    rs.map(r => r.get(r.fieldIndex(c)))

  private def rowsAtLeast(n: Int): Eff = (s"rows>=$n", _.length >= n)
  private def rowsExactly(n: Int): Eff = (s"rows==$n", _.length == n)
  /** ≥ n distinct non-null values — the column actually varies. */
  private def distinctAtLeast(c: String, n: Int): Eff =
    (s"distinct($c)>=$n", rs => vals(rs, c).filter(_ != null).distinct.length >= n)
  /** one row per key — the latest-wins/dedup shape. */
  private def unique(c: String): Eff =
    (s"unique($c)", rs => vals(rs, c).distinct.length == rs.length)
  private def some(c: String)(desc: String, p: Any => Boolean): Eff =
    (s"some($c):$desc", rs => vals(rs, c).exists(p))
  private def all(c: String)(desc: String, p: Any => Boolean): Eff =
    (s"all($c):$desc", rs => vals(rs, c).forall(p))
  /** some value strictly positive — the aggregate/measure fired. */
  private def pos(c: String): Eff = some(c)(">0", v => num(v) > 0)
  private def allPos(c: String): Eff = all(c)(">0", v => num(v) > 0)
  /** both branches: some zero AND some positive. */
  private def zeroAndPos(c: String): Eff =
    (s"zeroAndPos($c)", rs => {
      val ns = vals(rs, c).map(num)
      ns.contains(0.0) && ns.exists(_ > 0)
    })
  private def someNull(c: String): Eff = some(c)("null", _ == null)
  private def noNulls(c: String): Eff = all(c)("nonNull", _ != null)
  private def nullAndNot(c: String): Eff =
    (s"nullAndNot($c)", rs => {
      val xs = vals(rs, c); xs.contains(null) && xs.exists(_ != null)
    })
  private def allEq(c: String, v: Double): Eff = all(c)(s"==$v", x => num(x) == v)
  private def trueAndFalse(c: String): Eff =
    (s"trueAndFalse($c)", rs => {
      val bs = vals(rs, c).collect { case b: Boolean => b }
      bs.contains(true) && bs.contains(false)
    })
  private def check(desc: String)(p: Array[Row] => Boolean): Eff = (desc, p)
  /** strictly fewer distinct groups than rows → grouping merged rows,
    * or a funnel/level count is non-increasing down the rows. */
  private def nonIncreasing(c: String): Eff =
    (s"nonIncreasing($c)", rs => {
      val ns = vals(rs, c).map(num)
      ns.zip(ns.drop(1)).forall { case (a, b) => a >= b }
    })

  // ------------------------------------------- the 214 effect entries

  private val effects: Map[String, Seq[Eff]] = Map(
    // A. core analytics
    "q01_total_agg" -> Seq(rowsExactly(1), pos("cnt"), pos("total")),
    "q02_group_topcat" -> Seq(distinctAtLeast("category", 5), pos("total"), nonIncreasing("total")),
    "q03_monthly" -> Seq(distinctAtLeast("month", 12), pos("total")),
    "q04_daily_topn" -> Seq(rowsExactly(10), pos("total")),
    "q05_filtered_range" -> Seq(rowsAtLeast(3), pos("qty")),
    "q06_multi_agg" -> Seq(distinctAtLeast("l_returnflag", 3), distinctAtLeast("l_linestatus", 2),
      pos("sum_qty"), check("min<=avg<=max")(rs => rs.forall(r =>
        num(r.get(r.fieldIndex("min_price"))) <= num(r.get(r.fieldIndex("avg_price"))) &&
        num(r.get(r.fieldIndex("avg_price"))) <= num(r.get(r.fieldIndex("max_price")))))),
    "q07_count_distinct" -> Seq(rowsExactly(1), check("0<uniq<cnt")(rs => {
      val r = rs.head
      num(r.get(r.fieldIndex("uniq_cust"))) > 0 &&
      num(r.get(r.fieldIndex("uniq_cust"))) < num(r.get(r.fieldIndex("cnt")))
    })),
    "q08_conditional_agg" -> Seq(pos("purchases"), pos("clicks"), pos("purchase_value")),
    "q09_having" -> Seq(rowsAtLeast(100), distinctAtLeast("cnt", 2), pos("total")),
    "q10_expr_agg" -> Seq(distinctAtLeast("l_returnflag", 3), pos("revenue"), pos("charge")),
    // B. joins
    "q11_join_dim" -> Seq(rowsAtLeast(20), pos("revenue")),
    "q12_star_join" -> Seq(distinctAtLeast("r_name", 5), distinctAtLeast("n_name", 20), pos("customers")),
    "q13_left_anti" -> Seq(rowsAtLeast(10), noNulls("c_custkey")),
    "q13b_any_join" -> Seq(distinctAtLeast("o_orderpriority", 5), pos("n_matched"),
      check("any-join matched <= orders")(rs => rs.forall(r =>
        num(r.get(r.fieldIndex("n_matched"))) <= num(r.get(r.fieldIndex("n_orders")))))),
    "q14_semi_exists" -> Seq(rowsAtLeast(500), noNulls("c_name")),
    "q15_join_topn" -> Seq(rowsExactly(10), pos("revenue"), nonIncreasing("revenue")),
    "q15b_bucketed_join" -> Seq(rowsExactly(10), pos("revenue"), nonIncreasing("revenue")),
    // C. windows
    "q16_topn_per_group" -> Seq(distinctAtLeast("o_orderpriority", 5), distinctAtLeast("rn", 3)),
    "q16b_topn_agg" -> Seq(distinctAtLeast("o_orderpriority", 5), distinctAtLeast("rn", 3)),
    // the rank gate must exercise what row_number cannot: tie groups
    // (duplicate (grp,bucket) rows), rank GAPS after ties, and a
    // boundary tie group overflowing k=5 rows in some partition
    "q16c_rank_ties" -> Seq(rowsAtLeast(17), distinctAtLeast("rk", 3),
      check("some tie group has >1 row")(rs =>
        rs.groupBy(r => (r.get(0), r.get(1))).values.exists(_.length > 1)),
      check("rank gap after a tie (rank semantics, not dense_rank)")(rs =>
        rs.groupBy(_.get(0)).values.exists { g =>
          val rks = g.map(r => num(r.get(r.fieldIndex("rk")))).distinct.sorted
          rks.zip(rks.drop(1)).exists { case (a, b) => b - a > 1 }
        }),
      check("some partition admits >k rows (boundary ties beyond k)")(rs =>
        rs.groupBy(_.get(0)).values.exists(_.length > 5))),
    "q17_running_sum" -> Seq(distinctAtLeast("event_type", 5), distinctAtLeast("running", 100), pos("running")),
    "q18_lag_delta" -> Seq(nullAndNot("delta"), some("delta")("negative", v => num(v) < 0)),
    "q18b_ch_window" -> Seq(nullAndNot("next_ok"), pos("first_ok")),
    "q19_moving_avg" -> Seq(distinctAtLeast("ma7", 100), pos("ma7")),
    "q20_rank_share" -> Seq(distinctAtLeast("rnk", 5), pos("nation_avg")),
    // D. CH functions
    "q21_argmax" -> Seq(distinctAtLeast("top_event", 2), distinctAtLeast("bottom_event", 2)),
    "q21b_combinators" -> Seq(all("c_null")("null", _ == null), pos("heavy_ln"),
      distinctAtLeast("a_flag", 2), allEq("s_def", 0)),
    "q22_quantiles" -> Seq(check("p50<=p90<=p99, all>0")(rs => rs.forall { r =>
      val (a, b, c) = (num(r.get(r.fieldIndex("p50"))), num(r.get(r.fieldIndex("p90"))), num(r.get(r.fieldIndex("p99"))))
      a > 0 && a <= b && b <= c
    })),
    "q22b_parametric_quantile" -> Seq(pos("p50"), check("p75<=p90")(rs => rs.forall(r =>
      num(r.get(r.fieldIndex("p75"))) <= num(r.get(r.fieldIndex("p90")))))),
    "q22c_quantile_weighted" -> Seq(check("wmed<=wp90, all>0")(rs => rs.forall { r =>
      val (a, b) = (num(r.get(r.fieldIndex("wmed"))), num(r.get(r.fieldIndex("wp90"))))
      a > 0 && a <= b
    })),
    "q22d_exact_variants" -> Seq(pos("sd"), check("q_low<=q_high")(rs => rs.forall(r =>
      num(r.get(r.fieldIndex("q_low"))) <= num(r.get(r.fieldIndex("q_high")))))),
    "q22e_quantile_variants" -> Seq(pos("iw_med"), check("bf_p25<=bf_med")(rs => rs.forall(r =>
      num(r.get(r.fieldIndex("bf_p25"))) <= num(r.get(r.fieldIndex("bf_med")))))),
    "q23_topk" -> Seq(distinctAtLeast("event_type", 5), rowsAtLeast(20), pos("cnt")),
    "q23b_parametric_topk" -> Seq(rowsExactly(5), noNulls("top_users")),
    "q23c_topk_weighted" -> Seq(rowsAtLeast(7), noNulls("top_prios")),
    "q24_grouparray" -> Seq(distinctAtLeast("n_orders", 5), pos("n_orders"), noNulls("orderkeys")),
    "q25_stats_corr" -> Seq(pos("sd_qty"), some("corr_qp")("nonzero", v => num(v) != 0),
      all("corr_qp")("in [-1,1]", v => math.abs(num(v)) <= 1)),
    "q25b_moments" -> Seq(pos("var_qty"), pos("bit_or"), some("skew_qty")("nonzero", v => num(v) != 0)),
    "q25c_stat_tests" -> Seq(pos("ent"), some("slope")("nonzero", v => num(v) != 0),
      some("t_student")("nonzero", v => num(v) != 0)),
    "q25d_interval_sweep" -> Seq(pos("mip"), pos("ils")),
    "q25e_association" -> Seq(pos("v"), pos("u"), all("v")("<=1", v => num(v) <= 1)),
    "q25f_rank_tests" -> Seq(pos("mwu"), pos("ks_d"), all("multi_null")("null", _ == null)),
    "q25g_decay_anova" -> Seq(pos("f_stat"), pos("ema_q")),
    "q26_uniq_approx" -> Seq(distinctAtLeast("event_type", 5), check("approx within 5% of exact")(
      rs => rs.forall { r =>
        val (u, e) = (num(r.get(r.fieldIndex("uniq_users"))), num(r.get(r.fieldIndex("exact_users"))))
        e > 0 && math.abs(u - e) / e < 0.05
      })),
    "q27_if_combinators" -> Seq(pos("purchases"), pos("avg_click_value"), pos("max_view_value")),
    "q27b_summap" -> Seq(rowsExactly(1), pos("total"), pos("n_big"), noNulls("sums")),
    "q27c_moving_agg" -> Seq(rowsAtLeast(3), noNulls("ms"), noNulls("ma")),
    "q27d_map_funcs" -> Seq(rowsAtLeast(1000), pos("vsum"), allEq("has_tax", 1),
      check("any_big both branches")(rs => {
        val bs = vals(rs, "any_big").map(num); bs.contains(0.0) && bs.contains(1.0)
      })),
    "q27e_map_series" -> Seq(rowsAtLeast(50), noNulls("pk"), noNulls("pv")),
    "q27f_foreach" -> Seq(rowsAtLeast(3), noNulls("sfe"), noNulls("cfe")),
    "q27g_resample" -> Seq(rowsAtLeast(3), noNulls("cnts"), noNulls("sums")),
    "q27h_map_avg_minmax" -> Seq(rowsExactly(1), noNulls("mins"), noNulls("maxs")),
    "q28_date_buckets" -> Seq(distinctAtLeast("hr", 24), distinctAtLeast("day", 30), pos("total")),
    "q28b_scalar_gauntlet" -> Seq(distinctAtLeast("yr", 7), pos("cnt"), allEq("max_dow", 7)),
    "q28c_url_ip" -> Seq(rowsAtLeast(3), allEq("ip_rt_err", 0), noNulls("host"), pos("cnt")),
    "q28d_string_search" -> Seq(zeroAndPos("c_sub"), zeroAndPos("c_re"),
      check("starts_key both branches")(rs => {
        val bs = vals(rs, "starts_key").map(num); bs.contains(0.0) && bs.contains(1.0)
      })),
    "q28e_float_math" -> Seq(pos("n_fin"), pos("n_inf"), allEq("e2", 128)),
    "q28f_format_bits" -> Seq(noNulls("bar14"), noNulls("b64rt"), pos("gcd_m"), allEq("r2", 8192)),
    "q28h_conversions" -> Seq(nullAndNot("n_or_null"), zeroAndPos("n_or_zero"), pos("iso_w")),
    "q28i_geo" -> Seq(pos("dist_m"), check("in_box both branches")(rs => {
      val bs = vals(rs, "in_box").map(num); bs.contains(0.0) && bs.contains(1.0)
    })),
    "q28j_bitmap" -> Seq(allPos("pair_xor"), allPos("pair_andnot"),
      check("and<or (buckets differ)")(rs => rs.forall(r =>
        num(r.get(r.fieldIndex("and_card"))) < num(r.get(r.fieldIndex("or_card")))))),
    "q28k_bits_ip" -> Seq(all("ok4")("true", _ == true), distinctAtLeast("g", 5),
      distinctAtLeast("cidr_lo", 100)),
    "q28l_datetime_tail" -> Seq(distinctAtLeast("snow", 100), distinctAtLeast("md", 12), noNulls("tod")),
    "q28m_string_distance" -> Seq(pos("jaro"), pos("lev"), distinctAtLeast("dl", 5)),
    "q28n_search_extract" -> Seq(zeroAndPos("fp"), zeroAndPos("cthe"), noNulls("g1")),
    "q28o_url_tail" -> Seq(distinctAtLeast("host_nw", 5), pos("cnt"), noNulls("pnames")),
    "q28p_datetime_surgery" -> Seq(distinctAtLeast("yr", 7), pos("cnt"), noNulls("last_dow")),
    "q28q_scalar_tail" -> Seq(rowsAtLeast(8), noNulls("mac"), distinctAtLeast("ds", 8), pos("td")),
    "q28r_space_curves" -> Seq(allEq("m3_rt", 1), allEq("h_rt", 1), distinctAtLeast("m2", 100)),
    "q29_chsql_dialect" -> Seq(rowsAtLeast(5), pos("purchases"), pos("avg_click")),
    "q29b_corpus_category" -> Seq(distinctAtLeast("category", 5), pos("total")),
    "q29c_with_totals" -> Seq(someNull("event_type"), check("totals row = sum of groups")(rs => {
      val groups = rs.filter(_.get(0) != null).map(r => num(r.get(r.fieldIndex("cnt")))).sum
      val tot = rs.filter(_.get(0) == null).map(r => num(r.get(r.fieldIndex("cnt")))).sum
      tot > 0 && tot == groups
    })),
    "q29d_param_query" -> Seq(rowsAtLeast(100), check("param filter pinned one category")(
      rs => vals(rs, "category").distinct.length == 1)),
    "q29e_limit_by" -> Seq(distinctAtLeast("prio", 5), check("exactly 2 per prio")(rs =>
      vals(rs, "prio").groupBy(identity).values.forall(_.length == 2))),
    "q29f_rollup" -> Seq(rowsAtLeast(40), distinctAtLeast("yr", 8), pos("total")),
    "q29g_setops" -> Seq(rowsAtLeast(1000), noNulls("c_name")),
    "q29h_settings_format" -> Seq(rowsAtLeast(5), pos("total")),
    "q29i_scalar_with" -> Seq(rowsAtLeast(5), pos("cnt")),
    "q29j_ch_types" -> Seq(distinctAtLeast("prio", 5), pos("mx"), noNulls("latest")),
    "q29k_limit_ties" -> Seq(rowsAtLeast(11), check("all tied on the boundary value")(
      rs => vals(rs, "bucket").distinct.length == 1)),
    "q29m_sample" -> Seq(distinctAtLeast("prio", 5), pos("n"), pos("total")),
    "q29n_qualify" -> Seq(distinctAtLeast("prio", 5), distinctAtLeast("rn", 3)),
    "q29n2_qualify_distinct" -> Seq(rowsExactly(5), unique("prio")),
    "q29o_merge_cluster" -> Seq(distinctAtLeast("_table", 3), pos("total")),
    "q29p_paste_join" -> Seq(distinctAtLeast("rank", 5), pos("total"), noNulls("tag")),
    "q29q_dialect_r11" -> Seq(rowsAtLeast(6), pos("avg_t"), pos("open_cnt")),
    "q29r_dialect_r12" -> Seq(distinctAtLeast("nname", 20), allEq("h3res", 1),
      check("subs both branches")(rs => {
        val bs = vals(rs, "subs").map(num); bs.contains(0.0) && bs.contains(1.0)
      })),
    "q29s_decimal" -> Seq(rowsAtLeast(100), all("bad_null")("null", _ == null),
      distinctAtLeast("d4", 100), noNulls("rt2")),
    "q29t_show_create" -> Seq(rowsExactly(1), some("statement")("contains CREATE TABLE",
      v => v != null && v.toString.contains("CREATE TABLE"))),
    "q29u_infile" -> Seq(rowsAtLeast(6), pos("cnt"), pos("total")),
    "q29v_offset_fetch" -> Seq(rowsExactly(7), noNulls("o_orderkey")),
    "q29w_system_catalog" -> Seq(distinctAtLeast("name", 3), pos("n_parts"), pos("total_rows"),
      some("is_in_partition_key")("==1", v => num(v) == 1),
      some("is_in_sorting_key")("==1", v => num(v) == 1)),
    "q38_dictget" -> Seq(distinctAtLeast("nation", 20), pos("n_hit"), noNulls("max_name")),
    "q38b_dict_hierarchy" -> Seq(rowsAtLeast(20), noNulls("chain"), trueAndFalse("under_one")),
    "q38c_dict_descendants" -> Seq(rowsAtLeast(20), noNulls("kids"), noNulls("all_desc")),
    "q38d_dict_ddl" -> Seq(distinctAtLeast("nation", 20), distinctAtLeast("region", 5), pos("n_supp")),
    "q38e_dict_complex_key" -> Seq(distinctAtLeast("segment", 5), pos("n_cust"), pos("above_avg")),
    "q78_delta_sum" -> Seq(some("delta_sum")("nonzero", v => num(v) != 0), pos("n")),
    "q78b_nonneg_derivative" -> Seq(pos("rate_sum"), all("rate_max")(">=0", v => num(v) >= 0)),
    "q91b_array_aggs" -> Seq(rowsAtLeast(10), pos("med_cust_total"), pos("mean_price")),
    "q91c_array_transforms" -> Seq(rowsAtLeast(100), noNulls("cum"), noNulls("diffs")),
    "q97_array_join" -> Seq(rowsAtLeast(200), pos("qty"), pos("price")),
    "q97b_array_join_bare" -> Seq(rowsAtLeast(900), pos("ns"), pos("ms")),
    // E. replication / CDC
    "q30_snapshot" -> Seq(rowsAtLeast(1000), distinctAtLeast("type", 5), pos("amount")),
    "q30b_format_roundtrip" -> Seq(rowsAtLeast(5), pos("total")),
    "q30c_arrow_roundtrip" -> Seq(rowsAtLeast(5), pos("total"), pos("cnt"), noNulls("latest")),
    "q31_cdc_latest" -> Seq(unique("user_id"), distinctAtLeast("last_type", 2), pos("last_event_id")),
    "q32_cdc_deletes" -> Seq(unique("user_id"), rowsAtLeast(50),
      check("deletes shrank the keyset below q31's")(rs => rs.length < 150)),
    "q33_scd2" -> Seq(nullAndNot("valid_to"), distinctAtLeast("event_type", 5)),
    "q34_incremental_agg" -> Seq(rowsAtLeast(5), pos("cnt"), pos("val")),
    "q35_agg_state_merge" -> Seq(rowsExactly(1), pos("cnt"), pos("uniq_users")),
    "q35b_state_merge_sql" -> Seq(rowsExactly(1), pos("cnt"), pos("min_v")),
    "q35c_mv_rematerialize" -> Seq(distinctAtLeast("et", 5), pos("total"), allEq("foreign_failed", 1)),
    "q36_collapsing" -> Seq(unique("user_id"), distinctAtLeast("net", 10), pos("last_event_id")),
    "q36b_versioned_collapse" -> Seq(unique("o_custkey"), pos("last_version")),
    "q36c_summing" -> Seq(unique("l_orderkey"), pos("qty"), pos("total")),
    "q37_final" -> Seq(distinctAtLeast("last_type", 5), pos("n_users")),
    "q39_matview" -> Seq(distinctAtLeast("event_type", 5), pos("cnt"), noNulls("min_ts")),
    "q98_ttl" -> Seq(distinctAtLeast("yr", 7), pos("cnt")),
    "q98b_ttl_ddl" -> Seq(rowsAtLeast(5), pos("cnt"), pos("total")),
    "q98c_ttl_groupby" -> Seq(rowsAtLeast(5), pos("cnt"), pos("total")),
    "q99_projection" -> Seq(rowsAtLeast(6), pos("sum_qty"), pos("sum_price")),
    "q99b_projection_ddl" -> Seq(rowsAtLeast(5), pos("total"), check("lo<=hi")(rs => rs.forall(r =>
      num(r.get(r.fieldIndex("lo"))) <= num(r.get(r.fieldIndex("hi")))))),
    "q99c_sort_projection" -> Seq(rowsAtLeast(2000), pos("total")),
    "q99d_subset_projection" -> Seq(rowsAtLeast(2000), pos("total")),
    "q100_mutation_sql" -> Seq(distinctAtLeast("status", 2), distinctAtLeast("prio", 5), pos("total")),
    "q101_optimize_sql" -> Seq(rowsAtLeast(5), pos("cnt"), pos("total")),
    "q102_kafka_mv_chain" -> Seq(distinctAtLeast("event_type", 5), pos("cents")),
    "q103_alter_column_sql" -> Seq(rowsAtLeast(5), pos("n_big"), pos("half_total")),
    "q104_stream_window" -> Seq(distinctAtLeast("window_start", 10), pos("cents")),
    "q105_stream_cdc" -> Seq(rowsAtLeast(5), pos("cnt"), pos("cents")),
    "q106_stream_dedup" -> Seq(rowsAtLeast(300), unique("fp")),
    "q106b_stream_neardedup" -> Seq(zeroAndPos("kept")),
    "q106c_stream_semdedup" -> Seq(zeroAndPos("kept")),
    "q107_stream_funnel" -> Seq(rowsAtLeast(3), distinctAtLeast("level", 3), allPos("n_users")),
    "q108_stream_retention" -> Seq(rowsAtLeast(5), pos("n_users")),
    // F. dedup
    "q40_dedup_exact" -> Seq(some("group_size")("dup groups", v => num(v) > 1),
      some("group_size")("singletons", v => num(v) == 1), unique("fp")),
    "q40b_incremental_dedup" -> Seq(rowsAtLeast(100), unique("doc_id"),
      all("doc_id")("store dropped the 250-299 overlap", v => num(v) >= 300),
      all("doc_id")("intra-batch dupes dropped to min-id originals", v => num(v) < 100000)),
    "q41_ngram_jaccard" -> Seq(rowsAtLeast(5), pos("inter"),
      all("jaccard")("in (0,1]", v => num(v) > 0 && num(v) <= 1)),
    "q42_minhash_lsh" -> Seq(rowsAtLeast(5), pos("est_jaccard")),
    "q42b_minhash_oracle" -> Seq(rowsAtLeast(10), pos("n_match"), distinctAtLeast("est_jaccard", 2)),
    "q43_simhash" -> Seq(rowsAtLeast(5), all("hamming")("<16", v => num(v) < 16)),
    "q43b_simhash_oracle" -> Seq(rowsAtLeast(3), distinctAtLeast("hamming", 2)),
    "q44_embedding_dup" -> Seq(rowsAtLeast(20), allPos("cos")),
    "q45_dedup_clusters" -> Seq(rowsAtLeast(100), check("some rows share a cluster rep")(rs =>
      vals(rs, "cluster_rep").distinct.length < rs.length)),
    "q46_substring_dedup" -> Seq(rowsAtLeast(10), pos("dup_windows"),
      check("covered<=n_tokens")(rs => rs.forall(r =>
        num(r.get(r.fieldIndex("covered_tokens"))) <= num(r.get(r.fieldIndex("n_tokens")))))),
    "q47_semdedup" -> Seq(rowsAtLeast(100), pos("n_survivors"),
      check("some bucket dropped a vector")(rs => rs.exists(r =>
        num(r.get(r.fieldIndex("n_survivors"))) < num(r.get(r.fieldIndex("n_vectors"))))),
      check("some bucket kept everything")(rs => rs.exists(r =>
        num(r.get(r.fieldIndex("n_survivors"))) == num(r.get(r.fieldIndex("n_vectors")))))),
    "q67b_global_shuffle" -> Seq(distinctAtLeast("shard_e0", 10),
      check("epochs reshuffle: some pos_e0 != pos_e1")(rs => rs.exists(r =>
        num(r.get(r.fieldIndex("pos_e0"))) != num(r.get(r.fieldIndex("pos_e1")))))),
    // G. similarity
    "q50_ann_brute" -> Seq(rowsExactly(10), allPos("cos"), nonIncreasing("cos")),
    "q51_ann_lsh" -> Seq(rowsAtLeast(10), allPos("cos")),
    "q52_knn_join_sample" -> Seq(zeroAndPos("n_agree")),
    "q53_ivf_pq" -> Seq(rowsAtLeast(5), allPos("cos")),
    "q53b_ivf_formula" -> Seq(rowsAtLeast(10), allPos("cos")),
    // the DDL gate probes at FULL width: exact top-10, the probe row
    // itself at distance 0 plus real positive distances
    "q53c_vector_index_ddl" -> Seq(rowsExactly(10), distinctAtLeast("dist", 5),
      some("dist")("==0", v => num(v) == 0.0), some("dist")(">0", v => num(v) > 0)),
    "q54_centroids" -> Seq(rowsAtLeast(50), pos("n")),
    "q55_vector_math" -> Seq(allEq("nrm", 1.0), distinctAtLeast("dot", 40), pos("l2")),
    "q59_embed_quantize" -> Seq(pos("max_code"), allEq("within_bound", 1), distinctAtLeast("scale", 100)),
    // H. text analysis
    "q56_unigram_logprob" -> Seq(all("avg_logprob")("<0", v => num(v) < 0), pos("n_toks")),
    "q57_bm25" -> Seq(rowsExactly(10), allPos("score"), nonIncreasing("score")),
    "q57b_hybrid_rrf" -> Seq(rowsExactly(10), allPos("rrf"),
      some("n_legs")("fusion happened: ==2", v => num(v) == 2)),
    "q58_contamination" -> Seq(zeroAndPos("frac"), pos("n_sh")),
    "q60_token_stats" -> Seq(rowsAtLeast(400), pos("n_tokens"),
      all("ttr")("in (0,1]", v => num(v) > 0 && num(v) <= 1)),
    "q61_quality_score" -> Seq(distinctAtLeast("quality", 100),
      all("quality")("in [0,1]", v => num(v) >= 0 && num(v) <= 1)),
    "q62_lang_id" -> Seq(distinctAtLeast("lang", 5), pos("cnt"),
      check("prediction agrees with the label somewhere")(rs => rs.exists(r =>
        r.get(r.fieldIndex("lang")) == r.get(r.fieldIndex("lang_pred"))))),
    "q63_fingerprint" -> Seq(rowsAtLeast(400), unique("fp")),
    "q64_token_count_bpeish" -> Seq(rowsAtLeast(10), pos("bpeish_tokens"), distinctAtLeast("avg_tokens", 10)),
    "q64b_bpe_pairs" -> Seq(rowsAtLeast(10), allPos("cnt")),
    "q64c_bpe_byte" -> Seq(rowsAtLeast(400), allEq("roundtrip", 1), pos("n_tokens")),
    "q65_pii_scrub" -> Seq(zeroAndPos("n_email"), zeroAndPos("n_ip"), zeroAndPos("n_phone")),
    "q66_chunking" -> Seq(distinctAtLeast("chunk_idx", 10), pos("n_tokens"),
      some("chunk_idx")(">0 (multi-chunk docs)", v => num(v) > 0)),
    "q66b_sequence_packing" -> Seq(distinctAtLeast("pack", 5), pos("tok_sum"), pos("n_docs")),
    "q67_shard_assign" -> Seq(rowsAtLeast(16), allPos("n_docs"), pos("sum_chars")),
    "q68_curation_pipeline" -> Seq(rowsAtLeast(10), pos("n_chunks"), pos("sum_tokens")),
    "q69_repetition" -> Seq(zeroAndPos("dup_gram5_frac"), pos("n_words"), pos("dup_word_frac")),
    // I. events analytics
    "q70_sessionize" -> Seq(distinctAtLeast("session_idx", 10),
      some("n_events")(">1 (grouping happened)", v => num(v) > 1)),
    "q71_funnel" -> Seq(rowsAtLeast(3), distinctAtLeast("level", 3), allPos("n_users")),
    "q72_retention" -> Seq(rowsAtLeast(5), allPos("n_users")),
    "q73_histogram" -> Seq(rowsAtLeast(10), pos("cnt"), check("lo<=hi")(rs => rs.forall(r =>
      num(r.get(r.fieldIndex("lo"))) <= num(r.get(r.fieldIndex("hi")))))),
    "q73b_adaptive_histogram" -> Seq(distinctAtLeast("event_type", 5), allPos("mass"), allPos("n_bins")),
    "q74_pivot" -> Seq(pos("n_click"), pos("n_error"), pos("n_purchase"), pos("n_signup"), pos("n_view")),
    "q75_window_funnel" -> Seq(rowsAtLeast(2), distinctAtLeast("level", 2), allPos("n_users")),
    "q75b_funnel_modes" -> Seq(distinctAtLeast("level_order", 3), allPos("n_users")),
    "q76_retention_combinator" -> Seq(rowsExactly(1), allPos("w_signup"), allPos("n_users"),
      check("retention narrows: purchase<=click<=signup")(rs => {
        val r = rs.head
        num(r.get(r.fieldIndex("w_purchase"))) <= num(r.get(r.fieldIndex("w_click"))) &&
        num(r.get(r.fieldIndex("w_click"))) <= num(r.get(r.fieldIndex("w_signup")))
      })),
    "q77_sequence_match" -> Seq(rowsExactly(1), pos("n_matched"),
      check("matched<=users")(rs => {
        val r = rs.head
        num(r.get(r.fieldIndex("n_matched"))) <= num(r.get(r.fieldIndex("n_users")))
      })),
    "q77b_sequence_count" -> Seq(pos("n_chains"), distinctAtLeast("n_chains", 5)),
    "q77c_sequence_time" -> Seq(rowsExactly(1), pos("n_within_day"), pos("n_over_hour"),
      pos("n_strict_next")),
    "q77d_sequence_next" -> Seq(nullAndNot("after_vc"), nullAndNot("head_next")),
    // J. multimodal
    "q80_binary_meta" -> Seq(rowsAtLeast(400), unique("content_md5"), distinctAtLeast("magic", 5)),
    "q80b_image_decode" -> Seq(trueAndFalse("ok"), pos("width"), pos("height")),
    "q80c_audio_decode" -> Seq(trueAndFalse("ok"), pos("sample_rate"), pos("rms")),
    "q80d_video_decode" -> Seq(trueAndFalse("ok"), pos("frames"), pos("lum_sum")),
    "q80e_image_resize" -> Seq(trueAndFalse("ok"), pos("width"), pos("lum_sum"),
      some("lum_sum")("failed-decode sentinel", v => num(v) < 0)),
    "q80f_multimodal_dedup" -> Seq(trueAndFalse("survived"), pos("emb0")),
    // K. sampling / arrays / fills
    "q90_sample_systematic" -> Seq(rowsExactly(1), check("a ~1% strict subset of lineitem")(rs => {
      val c = num(rs.head.get(rs.head.fieldIndex("cnt")))
      c > 0 && c < 2000 // full lineitem is ~60k at the gate SF
    }), pos("n_orders")),
    "q90b_stratified" -> Seq(distinctAtLeast("lang", 5), allPos("n_docs")),
    "q90c_mixture" -> Seq(rowsAtLeast(10), allPos("rate"), all("rate")("<=1", v => num(v) <= 1.0001)),
    "q91_array_analytics" -> Seq(pos("n_orders"), check("has_urgent both branches")(rs => {
      val bs = vals(rs, "has_urgent").map(num); bs.contains(0.0) && bs.contains(1.0)
    })),
    "q91d_array_tail" -> Seq(rowsAtLeast(1000), allEq("r_cnt", 3), pos("r_sum")),
    "q91e_array_sets" -> Seq(rowsAtLeast(3), noNulls("common"), noNulls("ps"), allPos("sample_n")),
    "q92_multiif_tiers" -> Seq(distinctAtLeast("tier", 3), allPos("cnt")),
    "q93_asof_attribution" -> Seq(nullAndNot("click_id"), nullAndNot("gap_us"),
      all("gap_us")(">=0 or null", v => v == null || num(v) >= 0)),
    "q93b_asof_sql" -> Seq(nullAndNot("click_id"), rowsAtLeast(1000)),
    "q94_json_extract" -> Seq(distinctAtLeast("event_type", 5), pos("avg_k"), pos("max_k")),
    "q94b_json_gauntlet" -> Seq(rowsAtLeast(1000), allEq("has_qty", 1), allEq("has_zz", 0),
      distinctAtLeast("jqty", 10)),
    "q95_gap_fill" -> Seq(zeroAndPos("cnt"), rowsAtLeast(30)),
    "q95b_with_fill" -> Seq(zeroAndPos("cnt"), rowsAtLeast(60)),
    "q95c_fill_interpolate" -> Seq(zeroAndPos("cnt"), distinctAtLeast("peak", 5)),
    "q95d_fill_date_axis" -> Seq(rowsAtLeast(60), distinctAtLeast("peak", 30), pos("cnt")),
    "q95e_fill_boundless" -> Seq(zeroAndPos("cnt"), rowsAtLeast(60)),
    "q95f_fill_half_bounded" -> Seq(zeroAndPos("cnt"), rowsAtLeast(60)),
    "q95g_fill_grouped" -> Seq(zeroAndPos("cnt"), distinctAtLeast("prio", 5)),
    "q95h_fill_staleness" -> Seq(zeroAndPos("cnt"), pos("mx")),
    "q95i_fill_desc" -> Seq(rowsAtLeast(60), distinctAtLeast("cnt", 2)),
    "q95j_fill_multikey" -> Seq(zeroAndPos("v"), zeroAndPos("b")),
    "q95k_fill_interpolate_expr" -> Seq(zeroAndPos("cnt"), distinctAtLeast("c", 20),
      distinctAtLeast("w", 20)),
    "q95l_fill_staleness_date" -> Seq(zeroAndPos("cnt"), rowsAtLeast(20)),
    "q96_partition_prune" -> Seq(rowsAtLeast(100), pos("total")),
  )

  // ------------------------------------------------------- the tests

  test("every registry query has an effect assertion (lockstep with SparkEntry)") {
    val queries = SparkEntry.queries.keySet
    val missing = queries -- effects.keySet
    val stale = effects.keySet -- queries
    assert(missing.isEmpty, s"queries without effect assertions: ${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty, s"effect assertions for unknown queries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  // ----------------------------------------- auto floors (round 19)
  //
  // The hand predicates above encode per-query INTENT; the recorded
  // floors encode the MEASURED variety of every gate output at the
  // gate SF (rows, per-column distinct counts, and which of the
  // null / zero / nonzero branches fired). The round-18 profile
  // sweep that found eight vacuous gates was a one-shot; this locks
  // it: a future re-seed, fixture edit or query change that REDUCES
  // any gate's variety fails the suite until the floors are
  // consciously regenerated with
  //   GRAFT_REGEN_VACUITY_FLOORS=1 sbt "testOnly graft.VacuitySpec"
  // (the diff of vacuity_floors.tsv then shows exactly what moved).

  private val floorsFile =
    java.nio.file.Paths.get("src/test/resources/vacuity_floors.tsv")
  private val regenFloors = sys.env.get("GRAFT_REGEN_VACUITY_FLOORS").contains("1")

  private final case class ColFloor(distinct: Int, hadNull: Boolean,
                                    hadZero: Boolean, hadNonzero: Boolean)
  private final case class Floor(rows: Int, cols: Seq[(String, ColFloor)])

  private def profile(rows: Array[Row]): Floor = {
    val cols = if (rows.isEmpty) Nil else rows.head.schema.fieldNames.toSeq.map { c =>
      val vs = vals(rows, c)
      val ns = vs.map(num)
      c -> ColFloor(
        distinct = vs.filter(_ != null).map(String.valueOf).distinct.length,
        hadNull = vs.contains(null),
        hadZero = ns.contains(0.0),
        hadNonzero = ns.exists(d => !d.isNaN && d != 0.0))
    }
    Floor(rows.length, cols)
  }

  private def loadFloors(): Map[String, Floor] = {
    if (!java.nio.file.Files.exists(floorsFile)) return Map.empty
    java.nio.file.Files.readAllLines(floorsFile).toArray(Array.empty[String])
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
        val p = l.split("\t", -1)
        val cols = if (p(2).isEmpty) Nil else p(2).split(";").toSeq.map { ce =>
          val q = ce.split("\\|", -1)
          q(0) -> ColFloor(q(1).toInt, q(2) == "1", q(3) == "1", q(4) == "1")
        }
        p(0) -> Floor(p(1).toInt, cols)
      }.toMap
  }

  private def writeFloors(fs: Seq[(String, Floor)]): Unit = {
    val body = "# machine-generated by VacuitySpec (GRAFT_REGEN_VACUITY_FLOORS=1) at sf0.01\n" +
      "# name\trows\tcol|distinct|hadNull|hadZero|hadNonzero;…\n" +
      fs.sortBy(_._1).map { case (n, f) =>
        val cs = f.cols.map { case (c, cf) =>
          s"$c|${cf.distinct}|${if (cf.hadNull) 1 else 0}|${if (cf.hadZero) 1 else 0}|${if (cf.hadNonzero) 1 else 0}"
        }.mkString(";")
        s"$n\t${f.rows}\t$cs"
      }.mkString("\n") + "\n"
    java.nio.file.Files.createDirectories(floorsFile.getParent)
    java.nio.file.Files.writeString(floorsFile, body)
  }

  private def checkFloor(name: String, now: Floor, rec: Floor,
                         failures: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (now.rows < rec.rows)
      failures += s"$name [floor]: rows ${now.rows} < recorded ${rec.rows}"
    val nowCols = now.cols.toMap
    rec.cols.foreach { case (c, r) =>
      nowCols.get(c) match {
        case None => failures += s"$name [floor]: column '$c' disappeared"
        case Some(n) =>
          if (n.distinct < r.distinct)
            failures += s"$name [floor]: distinct($c) ${n.distinct} < recorded ${r.distinct}"
          if (r.hadNull && !n.hadNull)
            failures += s"$name [floor]: null branch of '$c' no longer fires"
          if (r.hadZero && !n.hadZero)
            failures += s"$name [floor]: zero branch of '$c' no longer fires"
          if (r.hadNonzero && !n.hadNonzero)
            failures += s"$name [floor]: nonzero branch of '$c' no longer fires"
      }
    }
  }

  test("recorded floors cover exactly the registry (regenerate on registry change)") {
    if (!regenFloors) {
      val rec = loadFloors().keySet
      val reg = SparkEntry.queries.keySet
      assert(rec == reg,
        s"floors out of lockstep — regenerate with GRAFT_REGEN_VACUITY_FLOORS=1; " +
          s"missing=${(reg -- rec).toSeq.sorted} stale=${(rec -- reg).toSeq.sorted}")
    }
  }

  test("no gate is vacuous: every query's sf0.01 result exercises its feature") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val recorded = if (regenFloors) Map.empty[String, Floor] else loadFloors()
    val profiles = scala.collection.mutable.ArrayBuffer[(String, Floor)]()
    effects.toSeq.sortBy(_._1).foreach { case (name, effs) =>
      val rows = try SparkEntry.queries(name)(spark, sfDir).collect()
      catch { case e: Exception =>
        failures += s"$name: query failed: ${e.getMessage.take(120)}"; Array.empty[Row]
      }
      if (rows.nonEmpty || !failures.exists(_.startsWith(s"$name:"))) {
        if (rows.isEmpty) failures += s"$name: EMPTY result"
        else {
          effs.foreach { case (desc, p) =>
            val ok = try p(rows) catch { case e: Exception =>
              failures += s"$name [$desc]: predicate error ${e.getMessage.take(80)}"; true
            }
            if (!ok) failures += s"$name [$desc]: VACUOUS — effect not observed"
          }
          val now = profile(rows)
          profiles += name -> now
          recorded.get(name).foreach(rec => checkFloor(name, now, rec, failures))
        }
      }
    }
    if (regenFloors) {
      writeFloors(profiles.toSeq)
      info(s"regenerated ${profiles.length} floors into $floorsFile")
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
