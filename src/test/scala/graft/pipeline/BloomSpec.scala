package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bloom sidecar: zero false negatives, FP-rate envelope, exact
  * mergeability (build-at-once == fold-in-batches, and re-fold is a
  * no-op), persisted round-trip, pruned-join exactness, and the
  * map-only probe plan.
  */
class BloomSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def keys(lo: Long, hi: Long) =
    spark.range(lo, hi).select(concat(lit("k"), col("id")).as("key"))

  test("no false negatives; FP rate within envelope") {
    val (m, k) = Bloom.sizeFor(1000, 0.01)
    val bf = Bloom.build(keys(0, 1000), "key", m, k)
    assert(keys(0, 1000).filter(!bf.mightContain(col("key")))
      .count() == 0, "false negative")
    val fp = keys(10000, 30000).filter(bf.mightContain(col("key")))
      .count()
    // theoretical ~1%; allow 3x envelope on 20k probes
    assert(fp < 600, s"fp rate ${fp / 20000.0} breaches envelope")
    assert(bf.mightContain(lit(null.asInstanceOf[String])) != null)
    assert(keys(0, 1).select(bf.mightContain(
      lit(null).cast("string")).as("c")).head().getBoolean(0) == false)
  }

  test("build-at-once == fold-in-batches; re-fold is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("bloom").toString
    Bloom.writeFilter(keys(0, 400), "key", 4096, 5, path)
    Bloom.updateFilter(spark, path, keys(400, 800), "key")
    val folded = Bloom.readFilter(spark, path)
    val once = Bloom.build(keys(0, 800), "key", 4096, 5)
    assert(folded.words.toSeq == once.words.toSeq)
    // idempotent under re-fold of an already-inserted batch
    Bloom.updateFilter(spark, path, keys(100, 500), "key")
    assert(Bloom.readFilter(spark, path).words.toSeq ==
      once.words.toSeq)
    assert(folded.numBits == 4096 && folded.numHashes == 5)
  }

  test("pruned join == exact join, fact side pruned before shuffle") {
    val fact = spark.range(0, 5000)
      .select(col("id").as("f_key"), (col("id") * 7).as("payload"))
    val dim = spark.range(0, 5000).filter(col("id") % 50 === 0)
      .select(col("id").as("d_key"), lit("x").as("tag"))
    val pruned = Bloom.prunedJoin(fact, dim, "f_key", "d_key")
    val exact = fact.join(dim, col("f_key") === col("d_key"))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(_.toSeq.toList).sortBy(_.toString).toList
    assert(key(pruned) == key(exact))
    assert(pruned.count() == 100)
  }

  test("probe predicate is map-only: no exchange added by the filter") {
    val bf = Bloom.build(keys(0, 100), "key", 1024, 3)
    val plan = keys(0, 1000).filter(bf.mightContain(col("key")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom probe must not shuffle:\n$plan")
  }

  test("sizeFor: word-aligned bits, sane hash count") {
    val (m, k) = Bloom.sizeFor(10000, 0.01)
    assert(m % 64 == 0 && m > 10000)
    assert(k >= 4 && k <= 10)
  }

  test("pruned anti-join == exact left_anti; null fact keys kept") {
    // f_key runs 0..4998 plus one NULL-keyed row; dim holds every
    // 50th key — the anti-join keeps non-members AND the null row
    val fact = spark.range(0, 5000)
      .select(when(col("id") === 4999, lit(null))
        .otherwise(col("id")).cast("long").as("f_key"),
        (col("id") * 7).as("payload"))
    val dim = spark.range(0, 5000).filter(col("id") % 50 === 0)
      .select(col("id").as("d_key"), lit("x").as("tag"))
    val pruned = Bloom.prunedAntiJoin(fact, dim, "f_key", "d_key")
    val exact = fact.join(dim, col("f_key") === col("d_key"),
      "left_anti")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(_.toSeq.toList).sortBy(_.toString).toList
    assert(key(pruned) == key(exact))
    // 4900 rows survive: 5000 minus the 100 dim-member keys, the
    // NULL-keyed row among the keepers
    assert(pruned.count() == 4900 && exact.count() == 4900)
    assert(pruned.filter(col("f_key").isNull).count() == 1)
  }
}
