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
}
