package graft.tools

import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the candidate re-pin of the simhash gate queries (round-9
  * verdict item 4): recall vs the exact all-pairs truth and wall time
  * for blocks=8 (the pinned gate point) against blocks=4 (the
  * narrower-radius point), all-pairs shape. The decision needs DATA:
  * blocks=4's guarantee (radius 7) does NOT cover the measured true-pair
  * Hamming (max 12), so any blocks=4 recall above the guarantee is
  * empirical collision luck — this tool shows whether that luck holds on
  * the planted corpus, and what it buys in seconds.
  */
object SimhashPointCompare {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Queries.docsWithNearDups(spark, s"/root/testdata/sf$sf")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8, maxDocFreq = 0))
    println(s"TRUTH: ${truth.size} pairs")

    case class Point(name: String, blocks: Int, pf: Int, cap: Int,
      rank: Int)
    val points = Seq(
      Point("gate-b8", 8, 15, 200, 32),
      Point("b8-derivedcap", 8, 15, 1000, 32),
      Point("b4-pf7", 4, -1, 1000, 32),
      Point("b4-pf12", 4, 12, 1000, 32))
    for (p <- points; it <- 1 to 3) {
      CacheScope.withScope { scope =>
        val t0 = System.nanoTime()
        val got = pairs(Dedup.simhashJaccardPairs(docs, "doc_id", "text",
          threshold = 0.8, blocks = p.blocks, prefilterHamming = p.pf,
          maxBucketSize = p.cap, probeBits = 1, verifyRankCap = p.rank,
          scope = scope))
        val sec = (System.nanoTime() - t0) / 1e9
        val missed = truth -- got
        val extra = got -- truth
        println(f"${p.name}%-15s it$it ${sec}%6.2f s  got=${got.size} " +
          f"missed=${missed.size} extra=${extra.size}")
      }
    }
    spark.stop()
  }
}
