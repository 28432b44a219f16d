package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Domain-mixture sampling: plan math, saturation, unweighted-domain
  * drop, and the deterministic membership contract.
  */
class MixtureSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // three domains, 100 tokens per row: a=10 rows (1000 tokens),
  // b=20 rows (2000), c=5 rows (500); d carries no weight
  private def docs = spark.range(40).select(col("id"),
    when(col("id") < 10, "a").when(col("id") < 30, "b")
      .when(col("id") < 35, "c").otherwise("d").as("domain"),
    concat(lit("doc "), col("id")).as("key"),
    lit(100L).as("toks"))

  test("mixturePlan computes targets and cutoffs per weighted domain") {
    val plan = Sampling.mixturePlan(docs, "domain", col("toks"),
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), tokenBudget = 1000L)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(plan.toSeq == Seq(
      ("a", 1000L, 500L, 32768L),  // f = 0.5 exactly
      ("b", 2000L, 250L, 8192L),   // f = 0.125 exactly
      ("c", 500L, 250L, 32768L)))  // f = 0.5 exactly
    // no row for the unweighted domain d
  }

  test("a domain under its target saturates at keep-all (65536)") {
    val plan = Sampling.mixturePlan(docs, "domain", col("toks"),
        Map("c" -> 1.0), tokenBudget = 10000L).collect()
    assert(plan.length == 1)
    assert(plan(0).getLong(3) == 65536L) // target 10000 > available 500
  }

  test("a zero-token domain emits NO plan row (not a keep-all cutoff)") {
    // weight*budget/available is a divide-by-zero here: without the
    // available_tokens > 0 filter, least() skips the null and the plan
    // would silently claim keep-all for a domain with nothing to give
    val zeroToks = docs.withColumn("toks",
      when(col("domain") === "a", lit(0L)).otherwise(col("toks")))
    val plan = Sampling.mixturePlan(zeroToks, "domain", col("toks"),
        Map("a" -> 0.5, "b" -> 0.5), tokenBudget = 1000L)
      .orderBy("domain").collect()
    assert(plan.map(_.getString(0)).toSeq == Seq("b"))
    // and the sample drops the domain entirely (defaultFrac 0)
    val out = Sampling.mixtureSample(zeroToks, "key", "domain",
      col("toks"), Map("a" -> 0.5, "b" -> 0.5), 1000L)
    assert(out.filter(col("domain") === "a").count() == 0L)
  }

  test("mixtureSample keeps saturated domains whole, drops unweighted") {
    val out = Sampling.mixtureSample(docs, "key", "domain", col("toks"),
      Map("c" -> 1.0, "a" -> 0.2), tokenBudget = 1000L)
    val byDomain = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c saturated (target 1000 > available 500): all rows kept
    assert(byDomain.getOrElse("c", 0L) == 5L)
    assert(!byDomain.contains("d")) // no weight -> dropped
    assert(!byDomain.contains("b"))
    // a sampled at fraction 200/1000 = 0.2: strictly partial
    assert(byDomain.getOrElse("a", 0L) < 10L)
  }

  test("membership is per-row deterministic and population-insensitive") {
    val w = Map("a" -> 0.3, "b" -> 0.3)
    val keysFull = Sampling.mixtureSample(docs, "key", "domain",
      col("toks"), w, 1000L).select("key").as[String].collect().toSet
    val again = Sampling.mixtureSample(docs, "key", "domain",
      col("toks"), w, 1000L).select("key").as[String].collect().toSet
    assert(keysFull == again)
    // a kept row stays kept when sampled alone at the same fractions:
    // fractions derive only from domain totals, membership only from
    // the row's own key bytes
    val cutoffs = Sampling.mixturePlan(docs, "domain", col("toks"), w,
        1000L).collect()
      .map(r => r.getString(0) -> r.getLong(3) / 65536.0).toMap
    val direct = Sampling.stratifiedHashSample(docs, "key", "domain",
      cutoffs).select("key").as[String].collect().toSet
    assert(keysFull == direct)
  }
}
