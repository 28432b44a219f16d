package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kernel roundtrip error is bounded by half a code cell") {
    val vs = emb.select($"embedding".cast("array<float>"))
      .as[Array[Float]].collect()
    assert(vs.nonEmpty)
    vs.foreach { v =>
      val (mn, mx, codes) = Similarity.quantizeCodesJ(v)
      assert(codes.forall(c => c >= 0 && c <= 255))
      val deq = Similarity.dequantizeJ(mn, mx, codes)
      val cell = (mx - mn) / 255.0
      v.zip(deq).foreach { case (orig, d) =>
        assert(math.abs(orig.toDouble - d.toDouble) <= cell / 2 + 1e-6,
          s"dim error ${math.abs(orig - d)} > half cell $cell")
      }
    }
  }

  test("pack/unpack is the identity on [0,255]") {
    val codes = (0 to 255).toArray
    assert(Similarity.unpackCodesJ(Similarity.packCodesJ(codes))
      .toSeq == codes.toSeq)
  }

  test("constant vectors code as zero and reconstruct exactly") {
    val (mn, mx, codes) = Similarity.quantizeCodesJ(
      Array(2.5f, 2.5f, 2.5f))
    assert(mn == 2.5 && mx == 2.5 && codes.toSeq == Seq(0, 0, 0))
    assert(Similarity.dequantizeJ(mn, mx, codes).toSeq ==
      Seq(2.5f, 2.5f, 2.5f))
  }

  test("non-finite embedding components are refused, not coded as 0") {
    intercept[IllegalArgumentException] {
      Similarity.quantizeCodesJ(Array(1f, Float.NaN))
    }
    intercept[IllegalArgumentException] {
      Similarity.quantizeCodesJ(Array(Float.PositiveInfinity, 0f))
    }
  }

  test("quantized storage roundtrip through DataFrames") {
    val q = Similarity.quantized(emb, "vec_id", "embedding")
    assert(q.columns.toSeq == Seq("vec_id", "mn", "mx", "qv"))
    val back = Similarity.dequantized(q, "vec_id")
    val orig = emb.select($"vec_id".cast("long"),
        $"embedding".cast("array<float>"))
      .as[(Long, Array[Float])].collect().toMap
    back.as[(Long, Array[Float])].collect().foreach { case (id, deq) =>
      val v = orig(id)
      assert(deq.length == v.length)
      val cos = Similarity.cosineJ(v, deq)
      assert(cos > 0.999, s"vec $id self-cosine $cos after roundtrip")
    }
  }

  test("quantized brute-force keeps recall@10 >= 0.9") {
    val vs = emb.select($"vec_id".cast("long"),
        $"embedding".cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val deq = vs.map { case (id, v) =>
      val (mn, mx, codes) = Similarity.quantizeCodesJ(v)
      id -> Similarity.dequantizeJ(mn, mx, codes)
    }
    val queries = vs.take(20)
    val recalls = queries.map { case (qid, qv) =>
      def top10(corpus: Array[(Long, Array[Float])]) = corpus
        .map { case (id, v) => (id, Similarity.cosineJ(v, qv)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val exact = top10(vs)
      val quant = top10(deq)
      (exact intersect quant).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall@10 $mean")
  }

  test("quantized IVF index returns the same top-1 as the float index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfq_").toString
    try {
      val centroids = Similarity.trainIvfCentroids(
        emb, "vec_id", "embedding", k = 4, sampleN = 1000, iters = 3)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
        s"$dir/f")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
        s"$dir/q", quantize = true)
      // sidecar self-description
      val side = spark.read.json(s"$dir/q.centroids").head()
      assert(side.getAs[Boolean]("quantized"))
      assert(!spark.read.json(s"$dir/f.centroids").head()
        .getAs[Boolean]("quantized"))
      val queries = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("qid"),
          transform($"embedding", x => x * lit(2.0f)).as("qv"))
      val f = Similarity.ivfTopKFromIndex(spark, s"$dir/f", queries,
          "qid", "qv", k = 1, nProbe = 1)
        .select("query_id", "id").as[(Long, Long)].collect().toMap
      val q = Similarity.ivfTopKFromIndex(spark, s"$dir/q", queries,
          "qid", "qv", k = 1, nProbe = 1)
        .select("query_id", "id").as[(Long, Long)].collect().toMap
      assert(f == q && f.nonEmpty)
      // scaled-self queries: the top-1 is the vector itself
      f.foreach { case (qid, id) => assert(qid == id) }
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
