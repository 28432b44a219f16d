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

  // ------------------------------------------------- sharded tier

  test("large flat filter probes via codegen reference, same bits as " +
      "the literal path") {
    // past literalWordCap words (4096 * 64 = 2^18 bits) the probe
    // switches to the reference expression; both paths must agree on
    // every key, and the plan must carry no giant literal
    val m = (Bloom.BloomFilter.literalWordCap + 64) * 64
    val bf = Bloom.build(keys(0, 2000), "key", m, 5)
    val small = Bloom.build(keys(0, 2000), "key", 4096 * 64, 5)
    assert(bf.words.length > Bloom.BloomFilter.literalWordCap)
    assert(keys(0, 2000).filter(!bf.mightContain(col("key")))
      .count() == 0, "false negative on the reference path")
    val plan = keys(0, 100).filter(bf.mightContain(col("key")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // the serialized plan stays small: the words ride a reference
    assert(plan.length < 200000, s"plan blew up: ${plan.length} chars")
    assert(small.words.length <= Bloom.BloomFilter.literalWordCap)
  }

  test("sharded sizing reaches past the 2^30 flat cap") {
    // 10^10 keys at 1% fpp: ~9.6e10 bits — flat sizeFor clamps at
    // 2^30, the sharded sizing does not
    val (flatM, _) = Bloom.sizeFor(10000000000L, 0.01)
    assert(flatM == (1L << 30))
    val (nShards, bitsPerShard, k) =
      ShardedBloom.sizeFor(10000000000L, 0.01)
    val logical = nShards.toLong * bitsPerShard
    assert(logical > (1L << 30), s"logical $logical")
    assert(logical >= 9e10.toLong, s"logical $logical under target")
    assert(bitsPerShard <= (1 << 27) && bitsPerShard % 64 == 0)
    assert(k >= 4 && k <= 10)
  }

  test("sharded filter: no false negatives, resident == sidecar-cogroup " +
      "probe, fold parity, pruned join exact") {
    val path = java.nio.file.Files
      .createTempDirectory("shbloom").toString + "/f"
    ShardedBloom.writeFilter(keys(0, 600), "key", numShards = 7,
      bitsPerShard = 4096, numHashes = 5, path)
    ShardedBloom.updateFilter(spark, path, keys(600, 1200), "key")
    val folded = ShardedBloom.readFilter(spark, path)
    val once = ShardedBloom.build(keys(0, 1200), "key", 7, 4096, 5)
    assert(folded.words.map(_.toSeq).toSeq ==
      once.words.map(_.toSeq).toSeq)
    // re-fold no-op (idempotent OR)
    ShardedBloom.updateFilter(spark, path, keys(100, 700), "key")
    assert(ShardedBloom.readFilter(spark, path).words.map(_.toSeq).toSeq
      == once.words.map(_.toSeq).toSeq)
    assert(folded.logicalBits == 7L * 4096)

    // resident probe: zero false negatives, FP envelope
    assert(keys(0, 1200).filter(!folded.mightContain(col("key")))
      .count() == 0)
    val fp = keys(10000, 20000)
      .filter(folded.mightContain(col("key"))).count()
    assert(fp < 600, s"fp $fp")

    // resident probe and the nothing-resident cogroup probe keep the
    // exact same rows
    val fact = spark.range(0, 3000)
      .select(concat(lit("k"), col("id") % 2000).as("key"),
        (col("id") * 3).as("payload"))
    val resident = fact.filter(folded.mightContain(col("key")))
      .collect().map(_.toSeq.toList).sortBy(_.toString).toList
    val cogrouped = ShardedBloom.pruneViaSidecar(spark, path,
        fact, "key")
      .collect().map(_.toSeq.toList).sortBy(_.toString).toList
    assert(resident == cogrouped && resident.nonEmpty)

    // sidecar-pruned join == exact join (false positives die)
    val dim = keys(0, 1200).select(col("key").as("d_key"))
    val pruned = ShardedBloom.prunedJoinViaSidecar(spark, path,
      fact, dim, "key", "d_key")
    val exact = fact.join(dim, col("key") === col("d_key"))
    val norm = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(_.toSeq.toList).sortBy(_.toString).toList
    assert(norm(pruned) == norm(exact) && pruned.count() > 0)
  }

  test("sharded anti-join == exact left_anti; null fact keys kept") {
    val path = java.nio.file.Files
      .createTempDirectory("shbloom_anti").toString + "/f"
    val dimKeys = spark.range(0, 1000).filter(col("id") % 3 === 0)
      .select(concat(lit("k"), col("id")).as("d_key"))
    ShardedBloom.writeFilter(dimKeys, "d_key", numShards = 5,
      bitsPerShard = 4096, numHashes = 5, path)
    val fact = spark.range(0, 1500)
      .select(when(col("id") === 1499, lit(null))
        .otherwise(concat(lit("k"), col("id"))).as("f_key"),
        (col("id") * 7).as("payload"))
    val pruned = ShardedBloom.prunedAntiJoinViaSidecar(spark, path,
      fact, dimKeys, "f_key", "d_key")
    val exact = fact.join(dimKeys, col("f_key") === col("d_key"),
      "left_anti")
    val norm = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(_.toSeq.toList).sortBy(_.toString).toList
    assert(norm(pruned) == norm(exact))
    assert(pruned.filter(col("f_key").isNull).count() == 1)
  }

  test("sharded fold is distributed: parity past the resident tier, " +
      "shard-partitioned generations, crash fallback intact") {
    // Configuration PAST the resident tier: 9 shards x 2^27 bits =
    // 1.2e9 logical bits > 2^30 — the size at which a driver-side
    // collect of the merged word table would be the old scale-killer.
    // The sparse word table stays tiny (few keys), so the test is
    // cheap; what it pins is the CODE PATH: the fold must write
    // through the distributed partitionBy(shard) swap, never a
    // collected single-file generation.
    val path = java.nio.file.Files
      .createTempDirectory("shbloom_big").toString + "/f"
    val nShards = 9
    val bps = 1 << 27
    assert(nShards.toLong * bps > (1L << 30), "config must exceed 2^30")
    ShardedBloom.writeFilter(keys(0, 300), "key", nShards, bps,
      numHashes = 5, path)
    ShardedBloom.updateFilter(spark, path, keys(300, 600), "key")
    ShardedBloom.updateFilter(spark, path, keys(450, 900), "key")

    // the live generation keeps the partitionBy(shard) directory
    // layout — the unpartitioned single-file shape the old collected
    // fold wrote would fail this (behavioral no-collect witness)
    val wordsDir = new java.io.File(s"$path/words")
    val shardDirs = wordsDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty, "fold lost the shard-partitioned layout")
    assert(!new java.io.File(s"$path/words_tmp").exists())

    // fold parity: incremental == one-shot sketch of the union
    val folded = SidecarIO.readWithFallback(spark, s"$path/words")
      .select(col("shard").cast("int"), col("word_idx"), col("bits"))
      .collect().map(_.toSeq.toList).sortBy(_.toString).toList
    val once = ShardedBloom.sketch(keys(0, 900), "key", nShards, bps, 5)
      .collect().map(_.toSeq.toList).sortBy(_.toString).toList
    assert(folded == once, "incremental fold != one-shot sketch")

    // probe still exact at this tier (cogroup path, nothing resident)
    val fact = keys(0, 1200).select(col("key"), lit(1).as("p"))
    val might = ShardedBloom.pruneViaSidecar(spark, path, fact, "key")
    assert(might.filter(col("key").isin(
      (0 until 900).map(i => s"k$i"): _*)).count() == 900,
      "false negative after distributed fold")
  }

  test("sharded resident probe plan: map-only, no giant literal") {
    val bf = ShardedBloom.build(keys(0, 500), "key", 5, 4096, 4)
    val plan = keys(0, 100).filter(bf.mightContain(col("key")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    assert(plan.length < 200000)
  }
}
