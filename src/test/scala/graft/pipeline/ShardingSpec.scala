package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")

  /** The contract, recomputed serially on the driver. */
  private def expected(budget: Long): Map[Long, Long] = {
    val toks = docs
      .select($"doc_id", TextAnalysis.tokenEstimate($"text").as("t"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
      .sortBy(_._1)
    var run = 0L
    toks.map { case (id, t) =>
      val shard = run / budget
      run += t
      id -> shard
    }.toMap
  }

  test("shard assignment equals the serial exclusive-prefix contract") {
    val got = Sharding.shardDocumentsByTokenBudget(
        docs, "doc_id", "text", budget = 1000)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected(1000))
    assert(got.values.max > 3, "fixture should span multiple shards")
  }

  test("assignment is invariant to the partition count") {
    val a = Sharding.shardDocumentsByTokenBudget(
        docs, "doc_id", "text", budget = 777, numPartitions = 1)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.shardDocumentsByTokenBudget(
        docs, "doc_id", "text", budget = 777, numPartitions = 7)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("all caller columns are preserved; shards are contiguous in id order") {
    val sharded = Sharding.shardDocumentsByTokenBudget(
      docs.withColumn("extra", $"doc_id" * 2), "doc_id", "text", 2000)
    assert(sharded.columns.toSet ==
      Set("doc_id", "text", "extra", "_tokens", "shard"))
    val rows = sharded.select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // shard ids never decrease when walking ids in order (a doc larger
    // than the budget may legitimately skip numbers)
    rows.sliding(2).foreach {
      case Array((_, s1), (id2, s2)) =>
        assert(s2 >= s1, s"decrease at $id2: $s1 -> $s2")
      case _ =>
    }
  }

  test("shardManifest sums tokens per shard; budget respected (one-doc slack)") {
    val budget = 1500L
    val sharded = Sharding.shardDocumentsByTokenBudget(
      docs, "doc_id", "text", budget)
    val manifest = Sharding.shardManifest(sharded).collect()
    val total = manifest.map(_.getLong(2)).sum
    val direct = docs
      .select(sum(TextAnalysis.tokenEstimate($"text").cast("long")))
      .as[Long].head()
    assert(total == direct)
    // every shard except possibly the last stays under budget + its
    // final doc's overflow: a shard only opens when the running sum is
    // still below the boundary, so shard_tokens < budget + max doc size
    val maxDoc = docs
      .select(max(TextAnalysis.tokenEstimate($"text").cast("long")))
      .as[Long].head()
    manifest.foreach { r =>
      assert(r.getLong(2) < budget + maxDoc,
        s"shard ${r.getLong(0)} holds ${r.getLong(2)} tokens")
    }
  }

  test("writeShards lays out one directory per shard + manifest") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards_").toString
    try {
      val sharded = Sharding.shardDocumentsByTokenBudget(
        docs, "doc_id", "text", 2000)
      Sharding.writeShards(sharded, dir)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
      val nShards = sharded.select(max($"shard")).as[Long].head() + 1
      assert(shardDirs.length == nShards, shardDirs.mkString(","))
      // round-trip: every doc lands in its assigned shard directory
      // partition discovery re-infers `shard` (int for small values);
      // cast both sides to long so the comparison is type-stable
      val back = spark.read.parquet(dir)
        .select(col("doc_id"), col("shard").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = sharded.select("doc_id", "shard")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(back == direct)
      val manifest = spark.read.parquet(s"$dir/_manifest")
      assert(manifest.count() == nShards)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }

  test("packSequences equals the serial concat-and-chunk contract") {
    val maxLen = 512L
    val toks = docs
      .select($"doc_id", TextAnalysis.tokenEstimate($"text").as("t"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
      .sortBy(_._1)
    var cum = 0L
    val exp = toks.map { case (id, t) =>
      val seq = cum / maxLen
      val off = cum % maxLen
      val nSeqs = math.max(1L, (cum + t + maxLen - 1) / maxLen - seq)
      cum += t
      id -> ((seq, off, nSeqs))
    }.toMap
    val got = Sharding.packDocumentSequences(
        docs, "doc_id", "text", maxLen, numPartitions = 7)
      .select("doc_id", "seq", "seq_offset", "n_seqs")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == exp)
    // the fixture must actually exercise boundary-straddling docs
    assert(exp.values.exists(_._3 > 1), "no doc spans a boundary")
    assert(exp.values.map(_._1).max > 2, "fixture spans few sequences")
  }

  test("packSequences: zero-token docs get n_seqs 1 at their offset") {
    val tiny = Seq((1L, "four tokens here now"), (2L, ""), (3L, "tail"))
      .toDF("doc_id", "text")
    // tokenEstimate: doc1 = max(4 words, 20 chars/4) = 5; "" = 0;
    // "tail" = max(1, 7/4) = 1. maxLen 3 → doc1 spans seqs 0..1,
    // doc2 (zero tokens) sits at cum 5 = (seq 1, off 2) with n_seqs 1,
    // doc3 starts at the same point.
    val got = Sharding.packSequences(tiny, "doc_id",
        TextAnalysis.tokenEstimate($"text"), maxLen = 3L)
      .select("doc_id", "seq", "seq_offset", "n_seqs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L, 0L, 2L), (2L, 1L, 2L, 1L),
      (3L, 1L, 2L, 1L)))
  }

  test("pass 2 reuses the range-exchange shuffle (map stage skipped)") {
    val sharded = Sharding.shardDocumentsByTokenBudget(
      docs, "doc_id", "text", 1000, numPartitions = 4)
    // pass 1 (the offsets job) already ran inside the call and
    // materialized the range-exchange shuffle files. Collecting the
    // assignment now runs pass 2: its job must submit ONLY its result
    // stage — a resubmitted exchange map stage would mean the shuffle
    // was recomputed (the property the two-pass design exists for).
    val submitted = new java.util.concurrent.atomic.AtomicInteger
    // count ONLY stages of the collect's own job group — a wall-clock
    // cutoff would race with backlogged pass-1 events draining into the
    // listener (same-millisecond straggler = spurious failure)
    val group = s"graft-pass2-${System.nanoTime}"
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (s.properties != null &&
            group == s.properties.getProperty("spark.jobGroup.id"))
          submitted.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "pass-2 stage count")
      try sharded.collect()
      finally spark.sparkContext.clearJobGroup()
      // the listener bus is async; give the events time to drain
      val deadline = System.nanoTime + 10000000000L
      while (submitted.get() < 1 && System.nanoTime < deadline)
        Thread.sleep(50)
      Thread.sleep(300) // let any unexpected extra submissions land
      assert(submitted.get() == 1,
        s"pass-2 collect submitted ${submitted.get()} stages; expected " +
          "1 (result only — the exchange map stage must be skipped)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("rejects a non-positive budget") {
    val e = intercept[IllegalArgumentException] {
      Sharding.shardDocumentsByTokenBudget(docs, "doc_id", "text", 0)
    }
    assert(e.getMessage.contains("budget"))
  }
}
