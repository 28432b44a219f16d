package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the on-disk byte ratio of the float vs int8-quantized IVF
  * index on the same corpus + centroids, and checks the two paths
  * return identical top-1s on scaled-self queries — the storage-claim
  * evidence behind `writeIvfIndex(quantize = true)`.
  */
object QuantizedIndexBytes {
  private def dirBytes(p: java.io.File): Long =
    if (p.isFile) p.length
    else Option(p.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val centroids = Similarity.trainIvfCentroids(
      emb, "vec_id", "embedding", k = 16)
    val base = java.nio.file.Files
      .createTempDirectory("graft_qbytes_").toString
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
        s"$base/f")
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", centroids,
        s"$base/q", quantize = true)
      val fb = dirBytes(new java.io.File(s"$base/f"))
      val qb = dirBytes(new java.io.File(s"$base/q"))
      val queries = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("qid"),
          transform(col("embedding"), x => x * lit(1.25f)).as("qv"))
      def top1(path: String) = Similarity.ivfTopKFromIndex(spark, path,
          queries, "qid", "qv", k = 1, nProbe = 1)
        .select("query_id", "id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val f1 = top1(s"$base/f")
      val q1 = top1(s"$base/q")
      println(f"QBYTES n=$n float=$fb quant=$qb " +
        f"ratio=${fb.toDouble / qb}%.2f " +
        s"top1_agree=${f1 == q1} queries=${f1.size} " +
        s"self_match=${q1.forall { case (a, b) => a == b }}")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
    }
    spark.stop()
  }
}
