package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Product quantization: encode determinism + tie-breaks, trained-
  * codebook ADC recall on a separated-cluster fixture, decode
  * reconstruction beating a coarse baseline, persisted round-trip
  * bit-parity, and the map-only scan plan.
  */
class ProductQuantSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import ProductQuant._

  private val dim = 16
  private val sub = 4 // 4 subspaces x 4 dims

  /** 3 well-separated clusters of 30 vectors each: cluster base +- a
    * small deterministic jitter, so exact top-1 of any member's own
    * query is itself and the rest of its cluster fills the top-k.
    */
  private def clustered(): org.apache.spark.sql.DataFrame = {
    val bases = Array(
      Array.fill(dim)(10.0f),
      Array.tabulate(dim)(j => if (j % 2 == 0) -8.0f else 12.0f),
      Array.tabulate(dim)(j => (j - 8).toFloat))
    (0 until 90).map { i =>
      val b = bases(i % 3)
      (i.toLong, b.zipWithIndex.map { case (x, j) =>
        x + ((i * 31 + j * 7) % 5 - 2) * 0.05f
      }.toSeq)
    }.toDF("id", "v").select(col("id"),
      col("v").cast("array<float>").as("v"))
  }

  test("encodeJ: argmin with lowest-code tie-break; decode round-trip") {
    val cb = PqCodebook(2, Array(
      Array(Array(0f, 0f), Array(1f, 1f), Array(0f, 0f)), // dup: tie -> 0
      Array(Array(5f, 5f), Array(-5f, -5f))))
    assert(encodeJ(Array(0.1f, -0.1f, 4f, 6f), cb).toSeq == Seq(0, 0))
    assert(encodeJ(Array(0.9f, 1.1f, -4f, -6f), cb).toSeq == Seq(1, 1))
    val dec = decodeJ(Array(1, 0), cb)
    assert(dec.toSeq == Seq(1f, 1f, 5f, 5f))
  }

  test("planted codebook is integer-valued and engine-exact by range") {
    val cb = plantedCodebook(8, 8, 16)
    val vals = cb.centroids.flatten.flatten
    assert(vals.forall(v => v == math.floor(v) &&
      v >= -256f && v <= 224f))
    assert(cb.dim == 64 && cb.codesPerSubspace == 16)
  }

  test("trained ADC top-k: own vector first, cluster mates follow") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val top = pqTopK(corpus, "id", "v", queries, "qid", "qv", cb, 5)
      .collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val ids = top(q).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      assert(ids.head == q, s"query $q: own vector not rank 1 ($ids)")
      // remaining top-5 come from the same cluster (id % 3 == q)
      assert(ids.tail.forall(_ % 3 == q),
        s"query $q: foreign-cluster id in top-5 ($ids)")
    }
  }

  test("decode reconstruction: trained codebook beats one-code-fits-all") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val rows = corpus.as[(Long, Array[Float])].collect()
    def err(v: Array[Float], w: Array[Float]): Double =
      v.zip(w).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
    val trained = rows.map { case (_, v) =>
      err(v, decodeJ(encodeJ(v, cb), cb)) }.sum / rows.length
    val gm = rows.map(_._2).transpose.map(c =>
      (c.map(_.toDouble).sum / c.length).toFloat)
    val coarse = rows.map { case (_, v) => err(v, gm.toArray) }
      .sum / rows.length
    assert(trained < coarse / 10,
      s"trained MSE $trained not << grand-mean MSE $coarse")
  }

  test("persisted index round-trip: codes and ADC results bit-identical") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val path = java.nio.file.Files
      .createTempDirectory("pqidx").toString + "/idx"
    writePqIndex(corpus, "id", "v", cb, path, recallK = 5,
      recallSampleN = 20)
    // the sidecar carries a MEASURED shortlist point
    val side = spark.read.json(s"$path.codebook").head()
    assert(side.getAs[Long]("shortlist") >= 5L &&
      side.getAs[Double]("shortlistRecall") > 0.0)
    val cb2 = readPqCodebook(spark, path)
    assert(cb2.subDim == cb.subDim &&
      cb2.centroids.flatten.flatten.toSeq ==
        cb.centroids.flatten.flatten.toSeq)
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val direct = pqTopK(corpus, "id", "v", queries, "qid", "qv", cb, 5)
      .select("query_id", "id", "adc", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val fromIdx = adcTopKFromIndex(spark, path, queries, "qid", "qv", 5)
      .select("query_id", "id", "adc", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(direct == fromIdx)
  }

  test("ivf-pq: full-probe equals flat ADC; nProbe=1 prunes partitions") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val coarse = trainCodebook(corpus, "id", "v", 1, 3,
      sampleN = 90, iters = 6).centroids(0) // 3 full-dim cells
    val path = java.nio.file.Files
      .createTempDirectory("ivfpq").toString + "/idx"
    writeIvfPqIndex(corpus, "id", "v", coarse, cb, path)
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    // probing EVERY cell must equal the flat (unpruned) ADC scan
    val full = ivfPqTopKFromIndex(spark, path, queries, "qid", "qv",
      k = 5, nProbe = coarse.length)
      .select("query_id", "id", "adc", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val flat = pqTopK(corpus, "id", "v", queries, "qid", "qv", cb, 5)
      .select("query_id", "id", "adc", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    assert(full == flat)
    // nProbe=1 on the separated clusters still finds the own cluster
    val one = ivfPqTopKFromIndex(spark, path, queries, "qid", "qv",
      k = 5, nProbe = 1)
    val byQ = one.collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { q =>
      val ids = byQ(q).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      assert(ids.head == q && ids.tail.forall(_ % 3 == q),
        s"query $q top-5 crossed clusters at nProbe=1: $ids")
    }
    // the cid filter must reach the scan as a partition filter
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"cid filter must prune partitions:\n$plan")
  }

  test("ivf-pq residual encoding: flag round-trips, recall beats the " +
      "raw encoding when clusters exceed the code budget") {
    // 8 clusters but only 4 codes per subspace: raw codes must spread
    // over 8 distinct subvector groups, residual codes only over the
    // +-0.1 within-cluster jitter — the FAISS IVFADC advantage.
    val bases = Array.tabulate(8)(c =>
      Array.tabulate(dim)(j => (math.sin(c * 2.1 + j) * 10).toFloat))
    val rows = (0 until 96).map { i =>
      val b = bases(i % 8)
      (i.toLong, b.zipWithIndex.map { case (x, j) =>
        x + ((i * 31 + j * 7) % 5 - 2) * 0.05f
      }.toSeq)
    }
    val corpus = rows.toDF("id", "v").select(col("id"),
      col("v").cast("array<float>").as("v"))
    // the true bases as coarse centroids (a trained coarse quantizer
    // can merge clusters under unlucky init; this test isolates the
    // ENCODING comparison, not coarse training quality)
    val coarse = bases
    // each encoding trains ITS OWN codebook (the honest comparison):
    // raw on the vectors, residual on the residuals
    val cbRaw = trainCodebook(corpus, "id", "v", sub, 4,
      sampleN = 96, iters = 8)
    val raws = rows.map { case (id, v) =>
      val vf = v.toArray
      (id, residualJ(vf, coarse(nearestCellL2(vf, coarse))).toSeq)
    }
    val resDf = raws.toDF("id", "v").select(col("id"),
      col("v").cast("array<float>").as("v"))
    val cbRes = trainCodebook(resDf, "id", "v", sub, 4,
      sampleN = 96, iters = 8)
    val dirBase = java.nio.file.Files
      .createTempDirectory("ivfpqres").toString
    val pRes = dirBase + "/res"
    val pRaw = dirBase + "/raw"
    writeIvfPqIndex(corpus, "id", "v", coarse, cbRes, pRes,
      residuals = true)
    writeIvfPqIndex(corpus, "id", "v", coarse, cbRaw, pRaw)
    assert(readIvfPqSidecar(spark, pRes)._3 === true)
    assert(readIvfPqSidecar(spark, pRaw)._3 === false)

    val nQ = 8
    val queries = corpus.filter(col("id") < nQ)
      .select(col("id").as("qid"), col("v").as("qv"))
    val vecs = rows.map { case (id, v) => id -> v.toArray }.toMap
    val truth = (0L until nQ.toLong).map { q =>
      val qv = vecs(q)
      q -> vecs.toSeq.map { case (id, v) =>
        (id, v.zip(qv).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum)
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap
    def recall(path: String): Double = {
      // full probe isolates the ENCODING (no pruning effects)
      val got = ivfPqTopKFromIndex(spark, path, queries, "qid", "qv",
        k = 5, nProbe = coarse.length)
        .select("query_id", "id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      truth.map { case (q, t) =>
        got(q).intersect(t).size.toDouble / t.size }.sum / truth.size
    }
    val (rRes, rRaw) = (recall(pRes), recall(pRaw))
    // within-cluster top-5 ordering rides on +-0.1 jitter, so neither
    // encoding is perfect — the pinned property is the IVFADC claim:
    // residual encoding strictly dominates when clusters outnumber
    // codes, and stays high in absolute terms
    assert(rRes > rRaw,
      s"residual recall $rRes does not beat raw recall $rRaw")
    assert(rRes >= 0.8, s"residual recall $rRes unexpectedly low " +
      s"(raw $rRaw)")
  }

  test("incremental append: folded halves serve bit-identical to a " +
      "build-at-once index; replayed batch is a no-op") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val coarse = trainCodebook(corpus, "id", "v", 1, 3,
      sampleN = 90, iters = 6).centroids(0)
    val dirBase = java.nio.file.Files
      .createTempDirectory("ivfpqapp").toString
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    for (residuals <- Seq(false, true)) {
      val pFull = dirBase + s"/full_$residuals"
      val pInc = dirBase + s"/inc_$residuals"
      writeIvfPqIndex(corpus, "id", "v", coarse, cb, pFull,
        residuals = residuals)
      // build on the first half, fold the rest in two stamped batches
      writeIvfPqIndex(corpus.filter(col("id") < 30), "id", "v", coarse,
        cb, pInc, residuals = residuals)
      appendToIvfPqIndex(spark, pInc,
        corpus.filter(col("id") >= 30 && col("id") < 60), "id", "v",
        batchId = Some(0L))
      appendToIvfPqIndex(spark, pInc, corpus.filter(col("id") >= 60),
        "id", "v", batchId = Some(1L))
      def serve(path: String) =
        ivfPqTopKFromIndex(spark, path, queries, "qid", "qv",
          k = 5, nProbe = coarse.length)
          .select("query_id", "id", "adc", "rank").collect()
          .map(_.toSeq).sortBy(_.toString).toSeq
      val full = serve(pFull)
      assert(serve(pInc) == full,
        s"residuals=$residuals: folded index diverges from rebuild")
      // at-least-once replay: the same batch id overwrites its own
      // delta — rows are not duplicated, results unchanged
      appendToIvfPqIndex(spark, pInc, corpus.filter(col("id") >= 60),
        "id", "v", batchId = Some(1L))
      assert(serve(pInc) == full,
        s"residuals=$residuals: replayed batch changed the index")
      // un-id'd folds allocate past existing deltas (no clobber):
      // appending a disjoint sliver only ADDS rows
      appendToIvfPqIndex(spark, pInc,
        corpus.limit(0), "id", "v") // empty fold is harmless too
      assert(serve(pInc) == full)
    }
    // the delta read keeps cid partition pruning: nProbe=1 plan over a
    // folded index still prunes
    val pInc = dirBase + "/inc_false"
    val one = ivfPqTopKFromIndex(spark, pInc, queries, "qid", "qv",
      k = 5, nProbe = 1)
    val plan = one.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r
      .findAllIn(plan).size >= 2, // base scan AND delta scan both prune
      s"cid filter must prune both base and delta scans:\n$plan")

    // COMPACTION: deltas fold into a fresh base generation; served
    // results unchanged, delta dirs gone, floor marker present
    def serveInc() =
      ivfPqTopKFromIndex(spark, pInc, queries, "qid", "qv",
        k = 5, nProbe = coarse.length)
        .select("query_id", "id", "adc", "rank").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
    val before = serveInc()
    compactIvfPqIndex(spark, pInc)
    assert(serveInc() == before, "compaction changed served results")
    val fs = new org.apache.hadoop.fs.Path(pInc).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$pInc.delta")),
      "folded delta dirs must be cleaned up")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$pInc/_folded_floor")), "compacted base must carry the floor")
    // a STALE delta at or below the floor (the swap/cleanup crash
    // window) is ignored by readers
    appendToIvfPqIndex(spark, pInc, corpus.filter(col("id") < 30),
      "id", "v", batchId = Some(1L)) // id 1 <= floor: dead on arrival
    assert(serveInc() == before, "reader must skip deltas <= floor")
    // a post-compaction UN-ID'D fold allocates past the floor and
    // serves (disjoint ids keep the corpus contract)
    val extra = clustered().select(col("id") + 1000, col("v"))
      .toDF("id", "v").filter(col("id") === 1000)
    appendToIvfPqIndex(spark, pInc, extra, "id", "v")
    val all = ivfPqTopKFromIndex(spark, pInc, queries, "qid", "qv",
      k = 91, nProbe = coarse.length) // corpus-wide: the fold must serve
    assert(all.filter(col("id") === 1000).count() > 0,
      "post-compaction un-id'd fold must allocate past the floor and serve")
  }

  test("flat PQ append: folded halves serve identical to a rebuild; " +
      "compaction preserves results") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val dirBase = java.nio.file.Files
      .createTempDirectory("pqapp").toString
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val pFull = dirBase + "/full"
    val pInc = dirBase + "/inc"
    writePqIndex(corpus, "id", "v", cb, pFull, recallSampleN = 0)
    writePqIndex(corpus.filter(col("id") < 45), "id", "v", cb, pInc,
      recallSampleN = 0)
    appendToPqIndex(spark, pInc, corpus.filter(col("id") >= 45),
      "id", "v", batchId = Some(0L))
    def serve(p: String) =
      adcTopKFromIndex(spark, p, queries, "qid", "qv", k = 5)
        .collect().map(_.toSeq.toList).sortBy(_.toString).toList
    val full = serve(pFull)
    assert(serve(pInc) == full, "folded flat index diverges from rebuild")
    appendToPqIndex(spark, pInc, corpus.filter(col("id") >= 45),
      "id", "v", batchId = Some(0L)) // replay: overwrite, not duplicate
    assert(serve(pInc) == full)
    compactPqIndex(spark, pInc)
    assert(serve(pInc) == full, "compaction changed served results")
    val fs = new org.apache.hadoop.fs.Path(pInc).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$pInc.delta")))
  }

  test("rerank with corpus-wide shortlist equals exact L2 top-k") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val reranked = pqRerankTopK(corpus, "id", "v", queries, "qid",
      "qv", cb, k = 4, shortlist = 90)
      .select("query_id", "id", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    // exact truth: brute-force squared L2
    val rows = corpus.as[(Long, Array[Float])].collect()
    val truth = (0L until 3L).flatMap { q =>
      val qv = rows.find(_._1 == q).get._2
      rows.map { case (id, v) =>
        val d = v.zip(qv).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum
        (q, id, d)
      }.sortBy { case (_, id, d) => (d, id) }.take(4).zipWithIndex
        .map { case ((qq, id, _), i) => Seq[Any](qq, id, i + 1) }
    }.sortBy(_.toString).toSeq
    assert(reranked == truth)
  }

  test("ivf-pq rerank from index: corpus-wide shortlist at full probe " +
      "equals exact L2 top-k (residual index)") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val coarse = trainCodebook(corpus, "id", "v", 1, 3,
      sampleN = 90, iters = 6).centroids(0)
    val path = java.nio.file.Files
      .createTempDirectory("ivfpqrr").toString + "/idx"
    writeIvfPqIndex(corpus, "id", "v", coarse, cb, path,
      residuals = true)
    val queries = corpus.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val reranked = ivfPqRerankTopK(spark, path, corpus, "id", "v",
      queries, "qid", "qv", k = 4, shortlist = 90,
      nProbe = coarse.length)
      .select("query_id", "id", "rank").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val rows = corpus.as[(Long, Array[Float])].collect()
    val truth = (0L until 3L).flatMap { q =>
      val qv = rows.find(_._1 == q).get._2
      rows.map { case (id, v) =>
        val d = v.zip(qv).map { case (a, b) =>
          (a.toDouble - b) * (a.toDouble - b) }.sum
        (q, id, d)
      }.sortBy { case (_, id, d) => (d, id) }.take(4).zipWithIndex
        .map { case ((qq, id, _), i) => Seq[Any](qq, id, i + 1) }
    }.sortBy(_.toString).toSeq
    assert(reranked == truth)
  }

  test("ivf-pq routing: L2 argmin with lowest-cell tie-break") {
    val coarse = Array(Array(0f, 0f), Array(1f, 1f), Array(0f, 0f))
    assert(nearestCellL2(Array(0.1f, -0.1f), coarse) == 0) // dup tie -> 0
    assert(nearestCellL2(Array(0.9f, 1.2f), coarse) == 1)
    assert(probeCellsL2(Array(0.9f, 1.2f), coarse, 2).toSeq ==
      Seq(1, 0))
  }

  test("shortlist curve: monotone, ends at 1.0 with corpus-wide R") {
    val corpus = clustered()
    val cb = trainCodebook(corpus, "id", "v", sub, 8,
      sampleN = 90, iters = 6)
    val curve = pqShortlistCurve(corpus, "id", "v", cb, k = 5,
      sampleN = 20, maxShortlist = 90)
    assert(curve.map(_._2) == curve.map(_._2).sorted,
      s"recall must be monotone in shortlist: $curve")
    assert(curve.last._2 == 1.0,
      s"corpus-wide shortlist must recall everything: $curve")
    val (r, rec) = derivePqShortlist(curve, target = 0.9)
    assert(rec >= 0.9 || r == curve.last._1)
  }

  test("ADC scan plan: no shuffle before the bounded top-k merge") {
    val corpus = clustered()
    val cb = plantedCodebook(sub, dim / sub, 8)
    val enc = encodeDf(corpus, "id", "v", cb)
    // encode itself is map-only
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"),
      s"encode plan shuffles:\n$encPlan")
    // the scan side of adcTopK shuffles ONLY the partitions x queries
    // x k survivors into the final window — assert a single exchange
    val queries = corpus.filter(col("id") < 2)
      .select(col("id").as("qid"), col("v").as("qv"))
    val top = adcTopK(enc, "id", "codes", queries, "qid", "qv", cb, 3)
    val nEx = "Exchange".r
      .findAllIn(top.queryExecution.executedPlan.toString).length
    assert(nEx <= 2, s"expected <=2 exchanges, got $nEx")
  }
}
