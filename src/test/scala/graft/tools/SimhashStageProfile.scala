package graft.tools
import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashStageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Queries.docsWithNearDups(spark, "/root/testdata/sf0.1")
    def t[T](l: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // kernel alone
    t("simhash kernel (count)")(Dedup.simhashDfJ(docs, "doc_id", "text").count())
    t("simhash kernel again")(Dedup.simhashDfJ(docs, "doc_id", "text").count())
    // full candidate pipeline, 3 warm runs
    for (i <- 1 to 3) {
      t(s"cand full run$i")(Dedup.simhashCandidatePairs(docs, "doc_id", "text",
        blocks = 8, maxHamming = 15, maxBucketSize = 200, probeBits = 1).count())
      CacheScope.releaseSession(spark)
    }
    spark.stop()
  }
}
