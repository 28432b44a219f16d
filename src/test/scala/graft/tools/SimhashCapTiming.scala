package graft.tools
import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession
object SimhashCapTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Queries.docsWithNearDups(spark, "/root/testdata/sf0.1")
    def t(l: String)(b: => Long): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime(); val n = b
        println(f"$l run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        CacheScope.releaseSession(spark)
      }
    }
    t("pf=15 rank=32 repart")(Dedup.simhashJaccardPairs(docs, "doc_id",
      "text", 0.8, 3, 8, 15, 200, probeBits = 1, verifyRankCap = 32).count())
    t("pf=13 rank=32 repart")(Dedup.simhashJaccardPairs(docs, "doc_id",
      "text", 0.8, 3, 8, 13, 200, probeBits = 1, verifyRankCap = 32).count())
  }
}
