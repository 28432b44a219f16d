package graft.tools
import graft.pipeline.{CacheScope, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IndexVsKernelTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
    val reps = 10
    val corpus = base.as[(Long, String)].flatMap { case (id, text) =>
      (0 until reps).map { rep =>
        (id + rep * 100000L, if (rep == 0) text else text + s" r$rep")
      }
    }.toDF("doc_id", "text").repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val batch = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count()
    val idxPath = java.nio.file.Files.createTempDirectory("ivk").toString
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", idxPath)
    def t(l: String)(b: => Long): Unit = {
      val t0 = System.nanoTime(); val n = b
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      CacheScope.releaseSession(spark)
    }
    for (i <- 1 to 3) {
      t(s"round$i fromIndex")(Dedup.minhashPairsFromIndex(spark, idxPath,
        batch, "doc_id", "text", threshold = 0.8).count())
      t(s"round$i kernelPath")(Dedup.minhashPairsIncremental(batch, corpus,
        "doc_id", "text", threshold = 0.8).count())
    }
    spark.stop()
  }
}
