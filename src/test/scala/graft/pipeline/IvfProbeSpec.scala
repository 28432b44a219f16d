package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF stored operating point: the recall-derived nProbe in the index
  * sidecar, defaulted reads resolving it, the legacy fallback, the
  * recall-curve invariants behind the derivation, and centroid-training
  * determinism across partitionings.
  */
class IvfProbeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/idx"

  test("recall curve is monotone and exhaustive probing is exact") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 8, sampleN = 500, iters = 3)
    val curve = Similarity.ivfRecallCurve(embs, "vec_id", "embedding",
      centroids, k = 5, sampleN = 50)
    assert(curve.map(_._1) == (1 to centroids.length))
    assert(curve.sliding(2).forall {
      case Seq((_, a), (_, b)) => b >= a
      case _ => true
    }, s"recall must be non-decreasing in nProbe: $curve")
    assert(curve.last._2 == 1.0,
      s"probing every cell must recover all truth: $curve")
  }

  test("index stores the derived point and defaulted reads resolve it") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 8, sampleN = 500, iters = 3)
    val path = tmp("ivf_probe")
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids,
      path, recallK = 5, recallTarget = 0.95, recallSampleN = 50)
    val side = spark.read.json(s"$path.centroids").head()
    val storedProbe = side.getAs[Long]("nProbe")
    val storedRecall = side.getAs[Double]("nProbeRecall")
    assert(storedProbe >= 1 && storedProbe <= centroids.length)
    assert(storedRecall >= 0.95 || storedProbe == centroids.length,
      s"stored point must meet the target or be exhaustive: " +
        s"probe=$storedProbe recall=$storedRecall")
    val queries = embs.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val defaulted = Similarity.ivfTopKFromIndex(spark, path, queries,
      "qid", "qv", k = 3).select("query_id", "id", "rank")
      .collect().map(_.toSeq).toSet
    val explicit = Similarity.ivfTopKFromIndex(spark, path, queries,
      "qid", "qv", k = 3, nProbe = storedProbe.toInt)
      .select("query_id", "id", "rank").collect().map(_.toSeq).toSet
    assert(defaulted == explicit)
    assert(defaulted.nonEmpty)
  }

  test("recallSampleN=0 skips derivation; defaulted reads fall back") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 8, sampleN = 500, iters = 3)
    val path = tmp("ivf_noderive")
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids,
      path, recallSampleN = 0)
    val side = spark.read.json(s"$path.centroids").head()
    assert(side.getAs[Long]("nProbe") == -1L)
    val queries = embs.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    // fallback nProbe=2 (the legacy default): must run and return rows
    val out = Similarity.ivfTopKFromIndex(spark, path, queries,
      "qid", "qv", k = 2)
    assert(out.count() > 0)
  }

  test("centroid training is deterministic across partitionings") {
    def train(df: org.apache.spark.sql.DataFrame) =
      Similarity.trainIvfCentroids(df, "vec_id", "embedding",
        k = 8, sampleN = 300, iters = 3)
    val a = train(embs.repartition(2))
    val b = train(embs.repartition(7, $"vec_id"))
    val c = train(embs.orderBy($"vec_id".desc))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq)
  }

  test("hash-ordered sample is corpus-wide, not an id prefix") {
    // the defect the hash order fixes: orderBy(id).limit(n) trains on
    // the lowest ids only; the hash order must draw across the range
    val ids = embs
      .orderBy(Sampling.hashOrderKey($"vec_id"), $"vec_id")
      .limit(40).select($"vec_id".cast("long")).as[Long].collect()
    val n = embs.count()
    assert(ids.max > n / 2,
      s"sample must reach the upper id range, got max=${ids.max} of $n")
    assert(ids.min < n / 2)
  }

  test("incremental append: folded IVF index serves identical to a " +
      "rebuild (raw and quantized); compaction preserves results") {
    val centroids = Similarity.trainIvfCentroids(embs, "vec_id",
      "embedding", k = 4, sampleN = 100)
    val queries = embs.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    for (quantize <- Seq(false, true)) {
      val pFull = tmp(s"ivfapp_full_$quantize")
      val pInc = tmp(s"ivfapp_inc_$quantize")
      Similarity.writeIvfIndex(embs, "vec_id", "embedding", centroids,
        pFull, quantize = quantize, recallSampleN = 0)
      Similarity.writeIvfIndex(embs.filter($"vec_id" % 3 === 0),
        "vec_id", "embedding", centroids, pInc, quantize = quantize,
        recallSampleN = 0)
      Similarity.appendToIvfIndex(spark, pInc,
        embs.filter($"vec_id" % 3 === 1), "vec_id", "embedding",
        batchId = Some(0L))
      Similarity.appendToIvfIndex(spark, pInc,
        embs.filter($"vec_id" % 3 === 2), "vec_id", "embedding",
        batchId = Some(1L))
      def serve(p: String) = Similarity
        .ivfTopKFromIndex(spark, p, queries, "qid", "qv", k = 5,
          nProbe = centroids.length)
        .collect().map(_.toSeq.toList).sortBy(_.toString).toList
      val full = serve(pFull)
      assert(serve(pInc) == full,
        s"quantize=$quantize: folded index diverges from rebuild")
      // replayed batch id: overwrite, not duplicate
      Similarity.appendToIvfIndex(spark, pInc,
        embs.filter($"vec_id" % 3 === 2), "vec_id", "embedding",
        batchId = Some(1L))
      assert(serve(pInc) == full)
      Similarity.compactIvfIndex(spark, pInc)
      assert(serve(pInc) == full,
        s"quantize=$quantize: compaction changed served results")
      val fs = new org.apache.hadoop.fs.Path(pInc).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$pInc.delta")))
    }
  }
}
