package graft.pipeline

import graft.{Queries, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CI guard for the SimHash operating point used by
  * `simhash_pairs_documents` (blocks=8, probeBits=1, prefilter=15,
  * cap=1000) — the promotion of tools/SimhashProfile from a measurement
  * script into an asserting gate. The cap is the ENVELOPE value, not a
  * tighter one: cap=200 measured 5 dropped true pairs at sf0.1 (the
  * skew cap engaging outside the pigeonhole guarantee — exactly the
  * failure this spec exists to catch, which is why sf0.1 is in the
  * guarded SF list).
  *
  * Three claims, checked against the exact all-pairs n-gram Jaccard truth
  * on the planted near-dup corpus at every gate SF present on disk:
  *
  *  1. DERIVATION HOLDS ON THE DATA: the max Hamming distance over true
  *     (Jaccard ≥ 0.8) pairs is ≤ 2*blocks-1 = 15, the multi-probe
  *     pigeonhole bound. If regenerated testdata pushes planted pairs
  *     past the bound, this fails with the measured number.
  *  2. CANDIDATE RECALL = 1.0: every true pair appears in the candidate
  *     set of the EXACT operating point (including the skew cap, which
  *     sits outside the pigeonhole bound — this is the composite the
  *     derivation alone cannot promise).
  *  3. END-TO-END EQUALITY: the verified SimHash pair set equals the
  *     all-pairs set — the same contract the driver's DuckDB oracle
  *     checks at sf0.01, held here at every local SF.
  */
class SimhashRecallSpec extends AnyFunSuite with SparkTestBase {

  private val blocks = 8
  private val probeBits = 1
  private val bound = 2 * blocks - 1 // = prefilterHamming in Queries
  private val cap = 1000

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("gate SFs exist") { assert(sfDirs.nonEmpty) }

  test("simhashOperatingPoint derivation matches the dry-run evidence") {
    // the gate point: radius 12 over ~5k docs fits blocks=8
    assert(Dedup.simhashOperatingPoint(12, 5000,
      maxBucketSize = cap).contains(8))
    // measured collapse at 10x (DEDUP_DRYRUN.md): same point, 50k docs
    assert(Dedup.simhashOperatingPoint(12, 50000,
      maxBucketSize = cap).isEmpty)
    // measured hold at 10x: radius 7 swaps to blocks=4 (16-bit keys)
    assert(Dedup.simhashOperatingPoint(7, 50000).contains(4))
    // 100 TB shape: small radius, huge corpus -> blocks=2 (32-bit keys)
    assert(Dedup.simhashOperatingPoint(3, 1L << 40,
      maxBucketSize = 10000).contains(2))
  }

  test("simhashBlocksForCorpus: the index build point tracks corpus size") {
    // gate-scale corpora fit 8-bit-keyed blocks=8
    assert(Dedup.simhashBlocksForCorpus(500) == 8)
    assert(Dedup.simhashBlocksForCorpus(5000) == 8)
    // the measured 10x collapse point (DEDUP_DRYRUN.md): 50k docs
    // saturate 256-value keys -> the build derives blocks=4, holding
    // its guarantee instead of freezing the saturated point
    assert(Dedup.simhashBlocksForCorpus(50000) == 4)
    // 16-bit keys saturate in the millions -> 32-bit blocks=2
    assert(Dedup.simhashBlocksForCorpus(100L * 1000 * 1000) == 2)
    // the envelope predicate agrees with the dry-run on both sides
    assert(Dedup.simhashEnvelopeHolds(8, 5000, 200))
    assert(!Dedup.simhashEnvelopeHolds(8, 50000, 1000))
  }

  for (dir <- sfDirs) {
    test(s"operating point holds at $dir") {
      val docs = Queries.docsWithNearDups(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8,
        maxDocFreq = 0) // exact truth
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTruth = truth.count()
      assert(nTruth > 0, s"no planted true pairs at $dir — corpus changed?")

      // claim 1: truth sits within the derived multi-probe bound
      val sh = Dedup.simhashDfJ(docs, "doc_id", "text")
      val truthHamming = truth
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("h"))
        .agg(max("h")).head().getAs[Number](0).longValue()
      info(s"$dir: true pairs=$nTruth, max Hamming=$truthHamming, " +
        s"bound=$bound")
      assert(truthHamming <= bound,
        s"true-pair Hamming $truthHamming exceeds the multi-probe bound " +
          s"$bound — the derived operating point no longer covers this " +
          s"corpus; raise probeBits or lower blocks")

      // claim 2: candidate recall (with the skew cap in force) is total
      val cand = Dedup.simhashCandidatePairs(docs, "doc_id", "text",
        blocks = blocks, maxHamming = bound, maxBucketSize = cap,
        probeBits = probeBits)
        .select("id_a", "id_b")
      val found = truth.join(cand, Seq("id_a", "id_b")).count()
      info(s"$dir: candidate recall $found/$nTruth")
      assert(found == nTruth,
        s"candidate recall $found/$nTruth < 1.0 at the operating point — " +
          s"the bucket cap dropped a true pair's every shared bucket")

      // claim 3: verified output == all-pairs truth, exactly
      val verified = Dedup.simhashJaccardPairs(docs, "doc_id", "text",
        threshold = 0.8, blocks = blocks, prefilterHamming = bound,
        maxBucketSize = cap, probeBits = probeBits)
        .select("id_a", "id_b")
      assert(verified.except(truth).count() == 0 &&
        truth.except(verified).count() == 0,
        "verified SimHash pair set differs from all-pairs Jaccard truth")

      // claim 4: the verify-density rank cap used by the gate query
      // (verifyRankCap=32) is an empirical dial OUTSIDE the pigeonhole
      // guarantee — this is its guard: with the cap in force the output
      // must STILL equal the truth (true pairs rank max 22 at sf0.1 /
      // 6 at sf0.01 from their best endpoint, SimhashRankProfile). If
      // regenerated testdata pushes a true pair below rank 32 at both
      // endpoints, this fails and the cap must be raised.
      val capped = Dedup.simhashJaccardPairs(docs, "doc_id", "text",
        threshold = 0.8, blocks = blocks, prefilterHamming = bound,
        maxBucketSize = cap, probeBits = probeBits, verifyRankCap = 32)
        .select("id_a", "id_b")
      assert(capped.except(truth).count() == 0 &&
        truth.except(capped).count() == 0,
        "rank-capped SimHash pair set differs from truth — raise " +
          "verifyRankCap in Queries.simhash_pairs_documents")

      truth.unpersist(); docs.unpersist()
      CacheScope.releaseSession(spark)
    }
  }
}
