package graft.tools
import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession

/** One-off: split the simhash gate-point cost into candidate generation
  * vs rank-cap + verify, at the exact operating point the gate queries
  * pin (blocks=8, pf=15, cap=1000, probe=1, rankCap=32, thr=0.7, sf0.1).
  */
object SimhashVerifyCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Queries.docsWithNearDups(spark, "/root/testdata/sf0.1")
    def t[T](l: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    docs.count() // fixture warm
    for (i <- 1 to 3) {
      val n = t(s"cand-only run$i")(Dedup.simhashCandidatePairs(docs,
        "doc_id", "text", blocks = 8, maxHamming = 15,
        maxBucketSize = 1000, probeBits = 1).count())
      println(s"  candidates=$n")
      CacheScope.releaseSession(spark)
    }
    for (i <- 1 to 3) {
      val n = t(s"full verify run$i")(Dedup.simhashJaccardPairs(docs,
        "doc_id", "text", threshold = 0.7, blocks = 8,
        prefilterHamming = 15, maxBucketSize = 1000,
        verifyRankCap = 32).count())
      println(s"  verified=$n")
      CacheScope.releaseSession(spark)
    }
    spark.stop()
  }
}
