package graft.tools

import graft.pipeline.Dedup
import graft.Queries
import org.apache.spark.sql.SparkSession

/** One-off cost split for simhash_pairs_documents at sf0.1: candidate
  * generation vs exact-Jaccard verify, and candidate volume by prefilter.
  */
object SimhashCostProfile {
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
    for (pf <- Seq(12, 15)) {
      val c = t(s"cand pf=$pf")(Dedup.simhashCandidatePairs(docs,
        "doc_id", "text", blocks = 8, maxHamming = pf,
        maxBucketSize = 200, probeBits = 1).count())
      println(s"  candidates=$c")
    }
    val full = t("full verify pf=15")(Dedup.simhashJaccardPairs(docs,
      "doc_id", "text", 0.8, 3, 8, 15, 200, probeBits = 1).count())
    println(s"  verified=$full")
    spark.stop()
  }
}
