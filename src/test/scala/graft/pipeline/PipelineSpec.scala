package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** documents + exact copies of every 10th + near-copies of every 20th. */
  private lazy val docsWithDups: DataFrame = {
    val exact = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val near = docs.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" zz qq xx")).as("text"))
    docs.select("doc_id", "text").union(exact).union(near)
  }

  test("exact dedup finds planted duplicate groups") {
    val groups = Dedup.exactGroups(docsWithDups, "doc_id", "text")
    assert(groups.count() == 50) // every 10th of 500
    val g0 = groups.filter($"keep_id" === 0).head()
    assert(g0.getAs[Long]("n_copies") == 2)
    val kept = Dedup.dropExactDuplicates(docsWithDups, "doc_id", "text")
    assert(kept.count() == docsWithDups.count() - 50)
    // keeper is always the min id
    assert(kept.filter($"doc_id" >= 10000 && $"doc_id" < 20000).count() == 0)
  }

  test("exact index: statuses, keepers, bloom clean-batch fast path") {
    val path = java.nio.file.Files
      .createTempDirectory("exact_idx").toString
    val corpus = Seq((1L, "aa text"), (2L, "bb text"), (3L, "aa text"))
      .toDF("doc_id", "text")
    Dedup.writeExactIndex(corpus, "doc_id", "text", path)
    val batch = Seq((10L, "aa text"), (11L, "cc text"),
      (12L, "cc text"), (13L, "dd text")).toDF("doc_id", "text")
    val got = Dedup.exactKeepFromIndex(spark, path, batch,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set((10L, "dup_of_corpus", 1L), (11L, "new", 11L),
      (12L, "dup_in_batch", 11L), (13L, "new", 13L)))
    // a batch with no corpus content: every decision 'new', own keeper
    // (the bloom prefilter typically yields an EMPTY prefix list here —
    // the no-index-read fast path — but bloom false positives are
    // legitimate, so only the decisions are contractual)
    val clean = Seq((20L, "zz one"), (21L, "zz two"))
      .toDF("doc_id", "text")
    val r2 = Dedup.exactKeepFromIndex(spark, path, clean,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(r2 == Set((20L, "new", 20L), (21L, "new", 21L)))
    // index layout: hash-prefix partition dirs + bloom + params present
    val root = new java.io.File(path)
    assert(new java.io.File(root, "hashes").listFiles()
      .exists(_.getName.startsWith("hp=")))
    assert(new java.io.File(root, "bloom").exists())
  }

  test("minhash LSH finds planted near-duplicates, never all-pairs") {
    val pairs = Dedup.minhashPairs(docsWithDups, "doc_id", "text",
      threshold = 0.7)
    val found = pairs.filter($"id_a" < 500 &&
      $"id_b" === $"id_a" + 20000).count()
    // near-copies (suffix of 3 tokens on ~100-token docs → J≈0.95)
    assert(found >= 20, s"expected ≥20 of 25 planted near-dups, got $found")
    // exact copies collide too (J=1.0)
    assert(pairs.filter($"id_a" < 500 &&
      $"id_b" === $"id_a" + 10000).count() == 50)
    // plan check: the join is on band/bucket, not a cartesian product
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "minhash candidate join must be bucketed")
  }

  test("ngram-jaccard blocking matches brute force on a sample") {
    val sample = docsWithDups.filter($"doc_id" % 5 === 0)
    val blocked = Dedup.ngramJaccardPairs(sample, "doc_id", "text", 0.8,
      maxDocFreq = 0) // exact mode vs brute force
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sh = sample.select($"doc_id".as("id"),
      Dedup.shingles($"text").as("sh"))
    val brute = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.id" < $"b.id")
      .withColumn("j", Dedup.jaccard($"a.sh", $"b.sh"))
      .filter($"j" >= 0.8)
      .select($"a.id", $"b.id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty)
  }

  test("containment pairs catch partial copies Jaccard misses") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      // doc 2 = a 5-token excerpt of doc 1: containment 1.0, Jaccard low
      (2L, "gamma delta epsilon zeta eta"),
      (3L, "totally different words entirely here now")).toDF(
      "doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        threshold = 0.9, maxDocFreq = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set((1L, 2L)))
    val (ca, cb) = got((1L, 2L))
    assert(cb == 1.0 && ca < 0.9) // excerpt fully contained; not vice versa
    // the same pair is invisible to Jaccard at any near-dup threshold
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, maxDocFreq = 0).count()
    assert(j == 0)
  }

  test("ngram stop-shingle guard is opt-out, not opt-in") {
    // 1100 single-shingle docs sharing ONE ultra-common shingle: the
    // BARE operator's default guard (maxDocFreq=1000) drops it from
    // candidate generation — a caller reaching for the undecorated name
    // at scale never gets the unbounded f² shingle self-join — while
    // explicit maxDocFreq=0 opts into exact mode and finds every pair
    val boiler = spark.range(1100)
      .select($"id".as("doc_id"), lit("aa bb cc").as("text"))
    assert(Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.8)
      .count() == 0, "default must drop the >1000-doc stop shingle")
    assert(Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.8,
      maxDocFreq = 0).count() == 1100L * 1099 / 2)
    CacheScope.releaseSession(spark)
  }

  test("simhash: identical → 0 hamming; near-dup found; bucketed join") {
    val pairs = Dedup.simhashPairs(docsWithDups, "doc_id", "text",
      maxHamming = 3)
    assert(pairs.filter($"id_a" < 500 && $"id_b" === $"id_a" + 10000)
      .filter($"hamming" === 0).count() == 50)
    val near = pairs.filter($"id_a" < 500 &&
      $"id_b" === $"id_a" + 20000).count()
    assert(near >= 15, s"simhash should catch most 3-token edits, got $near")
  }

  private lazy val embs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("embedding near-dup pairs via hyperplane LSH") {
    val near = embs.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 5000).as("vec_id"),
        transform($"embedding", x => x * 1.001f).as("embedding"))
    val all = embs.select("vec_id", "embedding").union(near)
    val pairs = Dedup.embeddingPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.999)
    val found = pairs.filter($"id_b" === $"id_a" + 5000).count()
    assert(found == 20, s"all 20 planted clones must be found, got $found")
  }

  test("incremental embedding dedup: batch vs corpus, same contract") {
    // corpus contains an internal dup pair (6000 ~ clone of vec 0)
    val corpus = embs.select("vec_id", "embedding")
      .union(embs.filter($"vec_id" === 0)
        .select(($"vec_id" + 6000).as("vec_id"),
          transform($"embedding", x => x * 1.001f).as("embedding")))
    // batch: near-clones of corpus vecs 25 and 50, plus an internal
    // batch dup pair (7001/7002 both clone vec 25)
    val b = embs.filter($"vec_id" === 25)
      .select(lit(7001L).as("vec_id"),
        transform($"embedding", x => x * 1.001f).as("embedding"))
      .union(embs.filter($"vec_id" === 25)
        .select(lit(7002L).as("vec_id"),
          transform($"embedding", x => x * 1.002f).as("embedding")))
      .union(embs.filter($"vec_id" === 50)
        .select(lit(7003L).as("vec_id"),
          transform($"embedding", x => x * 1.001f).as("embedding")))
    val pairs = Dedup.embeddingPairsIncremental(b, corpus,
      "vec_id", "embedding", dim = 64, threshold = 0.999)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch-vs-corpus hits, batch id first
    assert(pairs.contains((7001L, 25L)), s"got $pairs")
    assert(pairs.contains((7002L, 25L)), s"got $pairs")
    assert(pairs.contains((7003L, 50L)), s"got $pairs")
    // batch-internal pair found once, oriented a<b
    assert(pairs.contains((7001L, 7002L)), s"got $pairs")
    // corpus-internal dup (0, 6000) must NOT appear; every pair has a
    // batch doc on the left
    assert(pairs.forall(_._1 >= 7000L), s"got $pairs")
    // agreement with the all-pairs operator restricted to batch rows
    val full = Dedup.embeddingPairs(corpus.union(b), "vec_id",
      "embedding", dim = 64, threshold = 0.999)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 >= 7000L || p._2 >= 7000L)
      .map(p => if (p._2 >= 7000L && p._1 < 7000L) (p._2, p._1) else p)
    assert(pairs == full, s"incremental $pairs != all-pairs $full")
  }

  test("brute-force top-k: self is rank 1 with cosine 1") {
    val queries = embs.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val topk = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "qid", "qv", k = 5)
    val self = topk.filter($"query_id" === $"id").collect()
    assert(self.length == 3)
    assert(self.forall(r => r.getAs[Int]("rank") == 1))
    assert(self.forall(r => math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9))
    assert(topk.count() == 15)
  }

  test("LSH top-k finds self and mostly agrees with brute force") {
    val queries = embs.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val approx = Similarity.lshTopK(embs, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, dim = 64)
    val self = approx.filter($"query_id" === $"id" && $"rank" === 1).count()
    assert(self == 5, "each query's own vector must be its top hit")
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate generation must be a bucket join")
  }

  test("IVF top-k: self is rank 1; high overlap with brute force") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 8, sampleN = 500, iters = 4)
    assert(centroids.length == 8 && centroids.forall(_.length == 64))
    val queries = embs.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val approx = Similarity.ivfTopK(embs, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, centroids, nProbe = 3)
    val self = approx.filter($"query_id" === $"id" && $"rank" === 1).count()
    assert(self == 5, "each query's own vector must be its top hit")
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      queries, "qid", "qv", k = 5)
      .select("query_id", "id")
    val overlap = approx.select("query_id", "id")
      .join(brute, Seq("query_id", "id")).count()
    assert(overlap >= 15, s"IVF nProbe=3/8 should catch most of top-5, " +
      s"got $overlap/25")
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "IVF candidate generation must be a cell join")
  }

  test("persisted IVF index: partition pruning + same results") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 8, sampleN = 500, iters = 4)
    val path = java.nio.file.Files
      .createTempDirectory("ivf-index").toString + "/idx"
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids, path)
    val reloaded = Similarity.readIvfCentroids(spark, path)
    assert(reloaded.length == centroids.length)
    assert(reloaded.zip(centroids).forall { case (a, b) =>
      a.sameElements(b) })
    val queries = embs.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val fromIndex = Similarity.ivfTopKFromIndex(spark, path,
      queries, "qid", "qv", k = 5, nProbe = 3)
    val direct = Similarity.ivfTopK(embs, "vec_id", "embedding",
      queries, "qid", "qv", k = 5, centroids, nProbe = 3)
    assert(fromIndex.select("query_id", "id", "rank").collect().toSet ==
      direct.select("query_id", "id", "rank").collect().toSet)
    // the cid filter must reach the scan as a partition filter
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"cid filter must prune partitions:\n$plan")

    // the sidecar is self-describing (dim/k/metric) and a query workload
    // with the WRONG embedding dimension is refused loudly up front
    val side = spark.read.json(s"$path.centroids").head()
    assert(side.getAs[Long]("dim") == 64L &&
      side.getAs[Long]("k") == centroids.length.toLong &&
      side.getAs[String]("metric") == "cosine")
    val short = queries.select($"qid", slice($"qv", 1, 32).as("qv"))
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfTopKFromIndex(spark, path, short, "qid", "qv",
        k = 5, nProbe = 3)
    }
    assert(err.getMessage.contains("dim=64") &&
      err.getMessage.contains("dim=32"), err.getMessage)

    // an EMPTY query batch (stream start, recovery replay) flows through
    // as an empty result with the full schema — not a head()-on-nothing
    // crash that would kill a streaming query
    val empty = Similarity.ivfTopKFromIndex(spark, path,
      queries.filter($"qid" < 0), "qid", "qv", k = 5, nProbe = 3)
    assert(empty.columns.toSeq ==
      Seq("query_id", "id", "cosine", "rank"))
    assert(empty.count() == 0L)
    // all-null vectors likewise: nothing to validate, empty result
    val allNull = Similarity.ivfTopKFromIndex(spark, path,
      queries.select($"qid",
        lit(null).cast("array<float>").as("qv")), "qid", "qv", k = 5)
    assert(allNull.count() == 0L)
  }

  test("IVF assignment is deterministic and cells partition the corpus") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 4, sampleN = 300, iters = 3)
    val a1 = Similarity.ivfAssignDf(embs, "vec_id", "embedding", centroids)
    val a2 = Similarity.ivfAssignDf(embs, "vec_id", "embedding", centroids)
    assert(a1.count() == embs.count())
    assert(a1.select("id", "cid").except(a2.select("id", "cid")).count() == 0)
    val cells = a1.groupBy("cid").count().count()
    assert(cells > 1, "corpus should spread over multiple cells")
  }

  test("incremental minhash dedup: batch vs corpus, no corpus-internal pairs") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // corpus contains an internal dup pair (9001 ~ copy of doc 0)
    val corpus = d.union(d.filter($"doc_id" === 0)
      .select(($"doc_id" + 9001).as("doc_id"), $"text"))
    // batch: near-dups of corpus docs 20 and 40, including an internal
    // batch dup pair (30001/30002 near-identical)
    val b = d.filter($"doc_id" === 20)
      .select(lit(30001L).as("doc_id"),
        concat($"text", lit(" zz")).as("text"))
      .union(d.filter($"doc_id" === 20)
        .select(lit(30002L).as("doc_id"),
          concat($"text", lit(" zz qq")).as("text")))
      .union(d.filter($"doc_id" === 40)
        .select(lit(30003L).as("doc_id"),
          concat($"text", lit(" xx")).as("text")))
    val pairs = Dedup.minhashPairsIncremental(b, corpus,
      "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch-vs-corpus hits
    assert(pairs.contains((30001L, 20L)), s"got $pairs")
    assert(pairs.contains((30002L, 20L)), s"got $pairs")
    assert(pairs.contains((30003L, 40L)), s"got $pairs")
    // batch-internal pair found once, oriented a<b
    assert(pairs.contains((30001L, 30002L)), s"got $pairs")
    // corpus-internal dup (0, 9001) must NOT appear
    assert(!pairs.exists(p => p._1 == 0L || p._1 == 9001L ||
      (p._2 == 9001L && p._1 < 30000L)), s"got $pairs")

    // the SimHash index under the same contract (both multi-probe
    // orientations must fire: either side may hold the probing 0-bit)
    val sPairs = Dedup.simhashPairsIncremental(b, corpus,
      "doc_id", "text", threshold = 0.7, blocks = 8,
      prefilterHamming = 15, maxBucketSize = 200)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sPairs.contains((30001L, 20L)), s"got $sPairs")
    assert(sPairs.contains((30002L, 20L)), s"got $sPairs")
    assert(sPairs.contains((30003L, 40L)), s"got $sPairs")
    assert(sPairs.contains((30001L, 30002L)), s"got $sPairs")
    assert(!sPairs.exists(p => p._1 == 0L || p._1 == 9001L ||
      (p._2 == 9001L && p._1 < 30000L)), s"got $sPairs")
    // agreement with the MinHash index on the same inputs
    assert(sPairs == pairs, s"simhash $sPairs != minhash $pairs")
    // every pair involves at least one batch doc
    assert(pairs.forall(_._1 >= 30000L), s"got $pairs")
  }

  test("incremental dedup runs per micro-batch on a stream (foreachBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val base = corpus.filter($"doc_id" === 20).head().getString(1)
    val input = MemoryStream[(Long, String)](spark)
    input.addData((40001L, base + " zz"), (40002L, "completely new text"))
    val found = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        found ++= Dedup.minhashPairsIncremental(batch, corpus,
          "doc_id", "text", threshold = 0.7)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(found.contains((40001L, 20L)), found)
    assert(!found.exists(_._1 == 40002L), found)
  }

  test("minhash index: from-index pairs equal the kernel-path incremental") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val batch = corpus.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" zz qq xx")).as("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_mh_index").toString
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", path)
    // params sidecar round-trips the index identity
    val p = spark.read.json(s"$path/params").head()
    assert(p.getAs[Long]("numHashes") == 64 && p.getAs[Long]("bands") == 16)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = pairs(Dedup.minhashPairsFromIndex(spark, path, batch,
      "doc_id", "text", threshold = 0.7))
    val kernelPath = pairs(Dedup.minhashPairsIncremental(batch, corpus,
      "doc_id", "text", threshold = 0.7))
    assert(fromIndex == kernelPath,
      s"index path $fromIndex != kernel path $kernelPath")
    assert(fromIndex.nonEmpty && fromIndex.forall(_._1 >= 20000L))
    CacheScope.releaseSession(spark)
  }

  test("exact + ngram incremental: contract parity with all-pairs truth") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // exact: planted exact copies must pair with their originals only
    val exactBatch = corpus.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val ep = Dedup.exactPairsIncremental(exactBatch, corpus,
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ep == corpus.filter($"doc_id" % 10 === 0).select($"doc_id")
      .collect().map(r => (r.getLong(0) + 10000, r.getLong(0))).toSet)

    // ngram: incremental output == all-pairs output restricted to
    // batch-involving pairs (exact semantics, so equality is EXACT)
    val nearBatch = corpus.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" zz qq xx")).as("text"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = pairs(Dedup.ngramJaccardPairsIncremental(nearBatch, corpus,
      "doc_id", "text", threshold = 0.8, maxDocFreq = 0))
    val full = pairs(Dedup.ngramJaccardPairs(
      corpus.union(nearBatch), "doc_id", "text", threshold = 0.8,
      maxDocFreq = 0))
      .collect { case (a, b) if a >= 20000 || b >= 20000 =>
        if (b >= 20000 && a < 20000) (b, a) else (a, b) }
    assert(inc == full, s"incremental $inc != all-pairs-restricted $full")
    assert(inc.nonEmpty && inc.forall(_._1 >= 20000L))

    // from-index parity for the ngram family
    val path = java.nio.file.Files
      .createTempDirectory("graft_ng_index").toString
    Dedup.writeNgramIndex(corpus, "doc_id", "text", path)
    val fromIndex = pairs(Dedup.ngramJaccardPairsFromIndex(spark, path,
      nearBatch, "doc_id", "text", threshold = 0.8, maxDocFreq = 0))
    assert(fromIndex == inc,
      s"index path $fromIndex != kernel path $inc")
    CacheScope.releaseSession(spark)
  }

  test("simhash index: from-index pairs equal the kernel-path incremental") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val batch = corpus.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 20000).as("doc_id"),
        concat($"text", lit(" zz qq xx")).as("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_sh_index").toString
    Dedup.writeSimhashIndex(corpus, "doc_id", "text", path)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = pairs(Dedup.simhashPairsFromIndex(spark, path, batch,
      "doc_id", "text", threshold = 0.7, blocks = 8,
      prefilterHamming = 15, maxBucketSize = 200))
    val kernelPath = pairs(Dedup.simhashPairsIncremental(batch, corpus,
      "doc_id", "text", threshold = 0.7, blocks = 8,
      prefilterHamming = 15, maxBucketSize = 200))
    assert(fromIndex == kernelPath,
      s"index path $fromIndex != kernel path $kernelPath")
    assert(fromIndex.nonEmpty && fromIndex.forall(_._1 >= 20000L))
    // the gate query's verify-density rank cap must not change the
    // verified output (same guard shape as SimhashRecallSpec claim 4)
    val capped = pairs(Dedup.simhashPairsFromIndex(spark, path, batch,
      "doc_id", "text", threshold = 0.7, blocks = 8,
      prefilterHamming = 15, maxBucketSize = 200, verifyRankCap = 32))
    assert(capped == kernelPath,
      s"rank-capped index path $capped != kernel path $kernelPath")

    // the index STORED its derived operating point (blocks=8 at this
    // corpus size) — a default read resolves it and matches the kernel
    // path run at the same stored point
    val params = spark.read.json(s"$path/params").head()
    assert(params.getAs[Long]("blocks") == 8L &&
      params.getAs[Long]("probeBits") == 1L &&
      params.getAs[Long]("nDocs") == corpus.count())
    val defaults = pairs(Dedup.simhashPairsFromIndex(spark, path, batch,
      "doc_id", "text", threshold = 0.7))
    val kernelAtStored = pairs(Dedup.simhashPairsIncremental(batch, corpus,
      "doc_id", "text", threshold = 0.7, blocks = 8, maxBucketSize = 1000))
    assert(defaults == kernelAtStored,
      s"stored-point read $defaults != kernel at stored point $kernelAtStored")

    // an explicit override the indexed corpus SATURATES is refused
    // loudly (the frozen-saturated-point failure mode), not silently run
    val err = intercept[IllegalArgumentException] {
      Dedup.simhashPairsFromIndex(spark, path, batch, "doc_id", "text",
        threshold = 0.7, blocks = 16, maxBucketSize = 1)
    }
    assert(err.getMessage.contains("saturates"), err.getMessage)
    CacheScope.releaseSession(spark)
  }

  test("embedding index: from-index pairs equal the kernel-path incremental") {
    val corpus = embs.select("vec_id", "embedding")
    val batch = embs.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"embedding", x => x * 1.001f).as("embedding"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_emb_index").toString
    Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding", path, dim = 64)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fromIndex = pairs(Dedup.embeddingPairsFromIndex(spark, path, batch,
      "vec_id", "embedding", threshold = 0.999))
    val kernelPath = pairs(Dedup.embeddingPairsIncremental(batch, corpus,
      "vec_id", "embedding", dim = 64, threshold = 0.999))
    assert(fromIndex == kernelPath,
      s"index path $fromIndex != kernel path $kernelPath")
    assert(fromIndex.nonEmpty && fromIndex.forall(_._1 >= 100000L))
    CacheScope.releaseSession(spark)
  }

  test("incremental simhash runs per micro-batch on a stream (foreachBatch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val base = corpus.filter($"doc_id" === 20).head().getString(1)
    val batchRows = Seq((60001L, base + " zz"), (60002L, "completely new text"))
    // the contract: each micro-batch must produce exactly what the batch
    // operator produces for the same (batch, corpus) inputs
    val expected = Dedup.simhashPairsIncremental(
      batchRows.toDF("doc_id", "text"), corpus, "doc_id", "text",
      threshold = 0.7, blocks = 8, prefilterHamming = 15,
      maxBucketSize = 200)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val input = MemoryStream[(Long, String)](spark)
    input.addData(batchRows: _*)
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        found ++= Dedup.simhashPairsIncremental(batch, corpus,
          "doc_id", "text", threshold = 0.7, blocks = 8,
          prefilterHamming = 15, maxBucketSize = 200)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        // the long-running-driver pattern: release the micro-batch's
        // operator caches after its terminal action
        CacheScope.releaseSession(spark)
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(found.toSet == expected,
      s"stream ${found.toSet} != batch contract $expected")
    assert(found.contains((60001L, 20L)), found)
    assert(!found.exists(_._1 == 60002L), found)
  }

  test("incremental embedding dedup runs per micro-batch on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = embs.select("vec_id", "embedding")
    val v25 = embs.filter($"vec_id" === 25)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val novel = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val batchRows = Seq(
      (70001L, v25.map(_ * 1.001f)), (70002L, novel))
    val expected = Dedup.embeddingPairsIncremental(
      batchRows.toDF("vec_id", "embedding"), corpus,
      "vec_id", "embedding", dim = 64, threshold = 0.999)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val input = MemoryStream[(Long, Array[Float])](spark)
    input.addData(batchRows: _*)
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        found ++= Dedup.embeddingPairsIncremental(batch, corpus,
          "vec_id", "embedding", dim = 64, threshold = 0.999)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        CacheScope.releaseSession(spark)
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(found.toSet == expected,
      s"stream ${found.toSet} != batch contract $expected")
    assert(found.contains((70001L, 25L)), found)
    assert(!found.exists(_._1 == 70002L), found)
  }

  test("tokenCount / langId / qualityScore basics") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "der hund und die katze ist das tier",
      "", "   ", "one").toDF("text")
    val r = df.select(TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.langId($"text").as("lang"),
      TextAnalysis.qualityScore($"text").as("q")).collect()
    assert(r(0).getInt(0) == 10 && r(0).getString(1) == "en")
    assert(r(1).getInt(0) == 8 && r(1).getString(1) == "de")
    assert(r(2).getInt(0) == 0 && r(2).getString(1) == "und")
    assert(r(3).getInt(0) == 0)
    assert(r(4).getInt(0) == 1)
    assert(r.forall(x => x.getInt(2) >= 0 && x.getInt(2) <= 100))
  }

  test("withLangId (staged scores) matches the Column-form langId") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "der hund und die katze ist das tier",
      "le chat et la maison est grande",
      "el gato de la casa es grande y bonito",
      "il gatto di casa che dorme e la luna",
      "", "   ", "one", "xyz qrs").toDF("text")
    val colForm = df.select($"text",
      TextAnalysis.langId($"text").as("lang")).collect()
    val staged = TextAnalysis.withLangId(df, "text").collect()
    assert(staged.map(r => (r.getString(0), r.getString(1))).toSeq ===
      colForm.map(r => (r.getString(0), r.getString(1))).toSeq)
    assert(staged.head.schema.fieldNames.toSeq == Seq("text", "lang"))
  }

  test("fingerprint is whitespace-insensitive but order-sensitive") {
    val df = Seq(
      ("a", "hello   world  "),
      ("b", "hello world"),
      ("c", "world hello")).toDF("id", "t")
    val fps = df.select($"id", TextAnalysis.fingerprint($"t").as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps("a") == fps("b"))
    assert(fps("b") != fps("c"))
  }

  test("multimodal blob plumbing: schema + REAL luminance-grid embedding") {
    val blobs = docs.limit(50).select($"doc_id",
      Multimodal.asBlob($"text", "fake/image").as("blob"))
    assert(blobs.schema("blob").dataType.simpleString ==
      "struct<content:binary,meta:struct<format:string,n_bytes:bigint,width:int,height:int>>")
    val meta = blobs.select($"blob.meta.n_bytes", $"blob.meta.width",
      $"blob.meta.height").head()
    // width/height unknown (null) until an actual decode fills them
    assert(meta.getLong(0) > 0 && meta.isNullAt(1) && meta.isNullAt(2))

    // kernel: planted constant-cell grids recover EXACTLY, both lossless
    // containers, including a non-divisible raster (cellPx 3, grid 4)
    val lumas = Array.tabulate(16)(c => (c * 17) % 256)
    for (fmt <- Seq("png", "bmp"); cellPx <- Seq(1, 2, 3)) {
      val bytes = Multimodal.encodeCellImage(4, 4, cellPx, lumas, fmt)
      assert(Multimodal.imageLumaGrid(bytes, 4, 4)
        .exists(_.sameElements(lumas)), s"$fmt cellPx=$cellPx")
    }
    // images SMALLER than the grid replicate pixels (no empty cells):
    // a 1x1 gray image embeds as 16 copies of its single luma
    val one = Multimodal.encodeCellImage(1, 1, 1, Array(123), "png")
    assert(Multimodal.imageLumaGrid(one, 4, 4)
      .exists(_.sameElements(Array.fill(16)(123))))
    // jpeg rasters decode too (lossy, so near not exact) and stay bounded
    val jpg = Multimodal.encodeImage(16, 16, seed = 5L, "jpg")
    val jemb = Multimodal.imageEmbedding(jpg, 4, 4)
    assert(jemb.exists(e => e.length == 16 && e.forall(f => f >= 0f && f <= 1f)))
    // undecodable bytes → None kernel-side, null column row-side
    assert(Multimodal.imageLumaGrid("not an image".getBytes, 4, 4).isEmpty)

    // dataframe level: the mapPartitions stage adds `embedding`; text
    // bytes are NOT an image, so every row lands null (quarantine shape)
    val undec = Multimodal.withImageEmbedding(blobs, "blob", 4, 2)
    assert(undec.columns.contains("embedding"))
    assert(undec.filter($"embedding".isNotNull).count() == 0)
    // and real planted grids come back exactly through the batch stage
    val planted = Seq((1L, Multimodal.encodeCellImage(4, 4, 2, lumas, "png")))
      .toDF("id", "img")
      .select($"id", Multimodal.asBlob($"img", "png").as("blob"))
    val emb = Multimodal.withImageEmbedding(planted, "blob", 4, 4)
      .head().getSeq[Float](2)
    assert(emb.map(f => math.round(f * 255)).sameElements(lumas))
  }

  test("multimodal REAL image decode: ImageIO recovers planted dims") {
    // kernel level: round-trip every JDK-writable container
    for ((wfmt, rfmt) <- Seq("png" -> "png", "jpg" -> "jpeg",
        "bmp" -> "bmp", "gif" -> "gif")) {
      val bytes = Multimodal.encodeImage(17, 9, seed = 7L, wfmt)
      assert(Multimodal.decodeImageMeta(bytes).contains((rfmt, 17, 9)),
        s"format $wfmt")
    }
    // non-image / degenerate bytes decode to None, never throw
    assert(Multimodal.decodeImageMeta(null).isEmpty)
    assert(Multimodal.decodeImageMeta(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImageMeta("not an image".getBytes).isEmpty)
    // truncated header: PNG magic without the IHDR payload
    val png = Multimodal.encodeImage(4, 4, 1L, "png")
    assert(Multimodal.decodeImageMeta(png.take(12)).isEmpty)

    // dataframe level: the mapPartitions decode stage fills meta from
    // the real bytes; undecodable rows keep claimed format + null dims
    val rows = Seq(
      (1L, Multimodal.encodeImage(5, 3, 1L, "png")),
      (2L, Multimodal.encodeImage(8, 2, 2L, "jpg")),
      (3L, "garbage".getBytes)).toDF("id", "img")
    val decoded = Multimodal.withImageMeta(
      rows.select($"id", Multimodal.asBlob($"img", "claimed").as("blob")),
      "blob")
      .select($"id", $"blob.meta.format", $"blob.meta.width",
        $"blob.meta.height")
      .orderBy("id").collect()
    assert(decoded(0).getString(1) == "png" &&
      decoded(0).getInt(2) == 5 && decoded(0).getInt(3) == 3)
    assert(decoded(1).getString(1) == "jpeg" &&
      decoded(1).getInt(2) == 8 && decoded(1).getInt(3) == 2)
    assert(decoded(2).getString(1) == "claimed" &&
      decoded(2).isNullAt(2) && decoded(2).isNullAt(3))
  }

  test("multimodal REAL audio decode: RIFF parse recovers planted meta") {
    // kernel level: recover every planted parameter, duration included
    val wav = Multimodal.encodeWav(sampleRate = 11000, channels = 2,
      bitsPerSample = 16, nFrames = 123, seed = 9L)
    assert(Multimodal.decodeAudioMeta(wav)
      .contains(("wav", 11000, 2, 16, 123L, 123L * 1000 / 11000)))
    // mono 8-bit, blockAlign 1
    val mono = Multimodal.encodeWav(8000, 1, 8, 100, 1L)
    assert(Multimodal.decodeAudioMeta(mono)
      .contains(("wav", 8000, 1, 8, 100L, 12L)))
    // degenerate bytes: None, never throw (quarantine contract)
    assert(Multimodal.decodeAudioMeta(null).isEmpty)
    assert(Multimodal.decodeAudioMeta(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeAudioMeta("RIFFnot really a wav".getBytes).isEmpty)
    assert(Multimodal.decodeAudioMeta(wav.take(30)).isEmpty) // truncated
    // an image is not audio (and vice versa — the sniffs are disjoint)
    val png = Multimodal.encodeImage(4, 4, 1L, "png")
    assert(Multimodal.decodeAudioMeta(png).isEmpty)
    assert(Multimodal.decodeImageMeta(wav).isEmpty)

    // crafted u32 chunk sizes must TERMINATE (quarantine, never hang):
    // size 0xFFFFFFF8 made the old Int-space advance `8 + size.toInt`
    // exactly 0 — an infinite loop on the executor thread
    def riffWith(chunks: Array[Byte]*): Array[Byte] = {
      val body = chunks.flatten.toArray
      val out = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      out.array()
    }
    def chunk(id: String, size: Int, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(size).put(body)
      out.array()
    }
    val junkBody = Array.fill[Byte](40)(7)
    for (evil <- Seq(0xFFFFFFF8, 0xFFFFFFF0, 0x7FFFFFFF, -1)) {
      assert(Multimodal.decodeAudioMeta(
        riffWith(chunk("JUNK", evil, junkBody))).isEmpty)
    }
    // a lying size on the data chunk still terminates: declared frames
    // are reported (truncated-file behavior), no walk past the buffer
    val fmtBody = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16).array()
    assert(Multimodal.decodeAudioMeta(riffWith(
      chunk("fmt ", 16, fmtBody),
      chunk("data", 0x10000, Array.empty[Byte])))
      .contains(("wav", 8000, 1, 16, 0x8000L, 0x8000L * 1000 / 8000)))
    // legal zero-size chunk between fmt and data still walks through
    assert(Multimodal.decodeAudioMeta(riffWith(
      chunk("fmt ", 16, fmtBody),
      chunk("JUNK", 0, Array.empty[Byte]),
      chunk("data", 4, Array.fill[Byte](4)(1))))
      .contains(("wav", 8000, 1, 16, 2L, 0L)))

    // dataframe level: the mapPartitions stage fills meta from real
    // bytes; undecodable rows keep claimed format + null fields
    val rows = Seq(
      (1L, Multimodal.encodeWav(16000, 1, 16, 160, 1L)),
      (2L, "garbage".getBytes)).toDF("id", "wav")
    val decoded = Multimodal.withAudioMeta(
      rows.select($"id",
        Multimodal.asAudioBlob($"wav", "claimed").as("blob")), "blob")
      .select($"id", $"blob.meta.format", $"blob.meta.sample_rate",
        $"blob.meta.channels", $"blob.meta.n_frames",
        $"blob.meta.duration_ms")
      .orderBy("id").collect()
    assert(decoded(0).getString(1) == "wav" &&
      decoded(0).getInt(2) == 16000 && decoded(0).getInt(3) == 1 &&
      decoded(0).getLong(4) == 160L && decoded(0).getLong(5) == 10L)
    assert(decoded(1).getString(1) == "claimed" && decoded(1).isNullAt(2))
  }

  test("multimodal REAL video decode: BMFF box walk recovers planted meta") {
    // kernel level: recover brand, timescale/duration, dims, frame count
    val mp4 = Multimodal.encodeMp4(timescale = 2400, durationTicks = 7200,
      width = 640, height = 360, nFrames = 72)
    assert(Multimodal.decodeVideoMeta(mp4)
      .contains(("isom", 640, 360, 2400, 3000L, 72L)))
    // integer-division duration (7 ticks at timescale 3 -> 2333 ms)
    assert(Multimodal.decodeVideoMeta(
        Multimodal.encodeMp4(3, 7, 16, 16, 2))
      .contains(("isom", 16, 16, 3, 2333L, 2L)))
    // degenerate bytes: None, never throw (quarantine contract)
    assert(Multimodal.decodeVideoMeta(null).isEmpty)
    assert(Multimodal.decodeVideoMeta(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeVideoMeta(
      "ftypnot really an mp4 file at all".getBytes).isEmpty)
    assert(Multimodal.decodeVideoMeta(mp4.take(40)).isEmpty) // truncated
    // the sniffs are disjoint across all three decoders
    val wav = Multimodal.encodeWav(8000, 1, 16, 10, 1L)
    val png = Multimodal.encodeImage(4, 4, 1L, "png")
    assert(Multimodal.decodeVideoMeta(wav).isEmpty)
    assert(Multimodal.decodeVideoMeta(png).isEmpty)
    assert(Multimodal.decodeAudioMeta(mp4).isEmpty)
    assert(Multimodal.decodeImageMeta(mp4).isEmpty)

    // crafted u32 box sizes must TERMINATE (quarantine, never hang) —
    // same failure family as the WAV chunk-walk hang: sizes that make
    // an Int-space advance zero/negative, sizes < the 8-byte header,
    // and sizes running past the buffer
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    def rawBox(size: Int, id: String, body: Array[Byte]): Array[Byte] =
      be(size) ++ id.getBytes("US-ASCII") ++ body
    val ftyp = rawBox(16, "ftyp", "isom".getBytes ++ be(0))
    for (evil <- Seq(0xFFFFFFF8, 0x7FFFFFFF, 7, 2, -1)) {
      assert(Multimodal.decodeVideoMeta(
        ftyp ++ rawBox(evil, "junk", Array.fill[Byte](24)(3))).isEmpty)
    }
    // a 64-bit largesize box is walked over correctly (size==1 marker)
    val mvhdBody = new Array[Byte](100) // v0: zeros except ts/duration
    System.arraycopy(be(1000), 0, mvhdBody, 12, 4)
    System.arraycopy(be(5000), 0, mvhdBody, 16, 4)
    val large = be(1) ++ "free".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(8).putLong(24L).array() ++
      Array.fill[Byte](8)(0)
    assert(Multimodal.decodeVideoMeta(ftyp ++ large ++
        rawBox(116, "moov", rawBox(108, "mvhd", mvhdBody)))
      .contains(("isom", 0, 0, 1000, 5000L, -1L)))
    // numeric sanity: a u32 timescale above Int.MaxValue (0x90000000)
    // must quarantine to None, not wrap to a negative Int in the meta
    val hugeTs = new Array[Byte](100)
    System.arraycopy(be(0x90000000), 0, hugeTs, 12, 4)
    System.arraycopy(be(5000), 0, hugeTs, 16, 4)
    assert(Multimodal.decodeVideoMeta(ftyp ++
      rawBox(116, "moov", rawBox(108, "mvhd", hugeTs))).isEmpty)

    // dataframe level: the mapPartitions stage fills meta from real
    // bytes; undecodable rows keep claimed format + null fields
    val rows = Seq(
      (1L, Multimodal.encodeMp4(600, 1200, 320, 240, 48)),
      (2L, "garbage".getBytes)).toDF("id", "v")
    val blobs = rows.select($"id",
      Multimodal.asVideoBlob($"v", "claimed").as("blob"))
    val decoded = Multimodal.withVideoMeta(blobs, "blob")
      .select($"id", $"blob.meta.format", $"blob.meta.width",
        $"blob.meta.height", $"blob.meta.timescale",
        $"blob.meta.duration_ms", $"blob.meta.n_frames")
      .orderBy("id").collect()
    assert(decoded(0).getString(1) == "isom" &&
      decoded(0).getInt(2) == 320 && decoded(0).getInt(3) == 240 &&
      decoded(0).getInt(4) == 600 && decoded(0).getLong(5) == 2000L &&
      decoded(0).getLong(6) == 48L)
    assert(decoded(1).getString(1) == "claimed" && decoded(1).isNullAt(2))

    // frame sampling from DECODED metadata: 8 evenly spaced real frame
    // indices in [0, 48); undecodable blob -> null (quarantine)
    val sampled = Multimodal.withVideoMeta(blobs, "blob")
      .select($"id",
        Multimodal.frameSampleIndices($"blob", 8).as("fs"))
      .orderBy("id").collect()
    assert(sampled(0).getSeq[Long](1) ==
      Seq(0L, 6L, 12L, 18L, 24L, 30L, 36L, 42L))
    assert(sampled(1).isNullAt(1))
  }

  test("repartitionByBytes sizes from plan stats without running a job") {
    val blobs = docs.select($"doc_id",
      Multimodal.asBlob($"text", "text/plain").as("blob"))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    val sized = Multimodal.repartitionByBytes(blobs, "blob",
      bytesPerTask = 1L << 20)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    assert(after == before, "stats path must not launch a Spark job")
    assert(sized.rdd.getNumPartitions >= 1)
    // exact opt-in still works (and pays its one aggregate job)
    val exact = Multimodal.repartitionByBytes(blobs, "blob",
      bytesPerTask = 1L << 20, exact = true)
    assert(exact.rdd.getNumPartitions >= 1)
  }
}
