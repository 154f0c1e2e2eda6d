package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Content-addressed sampling: reproducible across partition layouts,
  * rates near target, strata rates independent. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq.tabulate(4000) { i =>
    (i.toLong, s"document body number $i with some text", if (i % 4 == 0) "en" else s"l${i % 3}")
  }.toDF("id", "text", "lang")

  test("sample is deterministic and partition-layout independent") {
    val a = Sampling.sample(docs.repartition(1), $"text", 0.5).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(docs.repartition(13), $"text", 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // rate lands near the target (md5 is uniform; 4000 draws)
    assert(math.abs(a.size / 4000.0 - 0.5) < 0.05)
    // monotone: a smaller rate is a subset of a larger one
    val c = Sampling.sample(docs, $"text", 0.25).select("id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("stratified applies per-stratum rates") {
    val out = Sampling.stratified(docs, $"text", $"lang", Map("en" -> 0.1), defaultRate = 0.8)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = out("en") / 1000.0            // 1000 en docs
    assert(math.abs(en - 0.1) < 0.05, s"en rate $en")
    Seq("l1", "l2").foreach { l =>
      val r = out(l) / 1000.0              // 1000 docs each for l1/l2
      assert(math.abs(r - 0.8) < 0.06, s"$l rate $r")
    }
    // rate 0 drops everything; rate 1 keeps everything
    assert(Sampling.stratified(docs, $"text", $"lang", Map("en" -> 0.0), 1.0)
      .where($"lang" === "en").count() == 0)
    assert(Sampling.stratified(docs, $"text", $"lang", Map.empty, 1.0).count() == 4000)
  }

  test("mixtureByBudget: NULL domain is a real stratum, NULL weight fails loudly") {
    val withNulls = docs.withColumn("dom",
      when($"id" % 5 === 0, lit(null).cast("string")).otherwise($"lang"))
    // weightOf total over all strata incl. NULL → NULL-domain rows
    // flow through the rate machinery instead of vanishing in the join
    val out = Sampling.mixtureByBudget(withNulls, $"text", $"dom", lit(1L),
      d => when(d.isNull, 5.0).otherwise(lit(1.0)), budget = 2000L)
    val byDom = out.groupBy($"dom").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byDom.contains(None), s"NULL-domain stratum missing: $byDom")
    assert(byDom(None) > 0)
    // every surviving row carries its domain's mix_rate
    assert(out.where($"mix_rate".isNull).count() == 0)
    // a weightOf that leaves a stratum NULL is a loud error, not a drop
    val err = intercept[Exception] {
      Sampling.mixtureByBudget(withNulls, $"text", $"dom", lit(1L),
        d => when(d === "en", 1.0), budget = 2000L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("weightOf returned NULL")), s"got $err")
  }
}
