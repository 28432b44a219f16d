package graft.tools

import graft.pipeline.{CacheScope, Dedup}
import graft.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures where TRUE pairs rank, per endpoint, when the simhash
  * candidate set (gate operating point: blocks=8, probe=1, pf=15,
  * cap=200) is ordered by ascending exact Hamming — the evidence needed
  * to size a per-endpoint rank cap between candidate generation and the
  * Jaccard verify.
  */
object SimhashRankProfile {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Queries.docsWithNearDups(spark, s"/root/testdata/sf$sf")
    CacheScope.withScope { scope =>
      val cand = Dedup.simhashCandidatePairs(docs, "doc_id", "text",
        blocks = 8, maxHamming = 15, maxBucketSize = 200, probeBits = 1,
        scope = scope)
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8,
        maxDocFreq = 0, scope = scope)
        .select($"id_a", $"id_b").withColumn("is_true", lit(true))
      // per-endpoint view: each pair counted from both ends
      val sides = cand.select($"id_a".as("pivot"), $"id_b".as("other"),
          $"hamming")
        .union(cand.select($"id_b".as("pivot"), $"id_a".as("other"),
          $"hamming"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("pivot")
        .orderBy($"hamming".asc, $"other".asc)
      val ranked = sides.withColumn("rn", row_number().over(w))
      val j = ranked.join(truth,
        ($"pivot" === $"id_a" && $"other" === $"id_b") ||
          ($"pivot" === $"id_b" && $"other" === $"id_a"), "left")
      val trueRanks = j.filter($"is_true").groupBy("pivot", "other")
        .agg(min($"rn").as("best_end_rank"))
      // per true PAIR, the better of its two endpoint ranks (the cap
      // keeps a pair if EITHER endpoint ranks it within M)
      val pairBest = trueRanks
        .select(least($"pivot", $"other").as("a"),
          greatest($"pivot", $"other").as("b"), $"best_end_rank")
        .groupBy("a", "b").agg(min($"best_end_rank").as("r"))
      val dist = pairBest.select($"r").as[Int].collect().sorted
      val nCand = cand.count()
      val nTrue = truth.count()
      println(s"sf=$sf candidates=$nCand truth=$nTrue " +
        s"truePairsInCand=${dist.length}")
      if (dist.nonEmpty)
        println(s"trueRank p50=${dist(dist.length / 2)} " +
          s"p90=${dist((dist.length * 9) / 10)} " +
          s"p99=${dist((dist.length * 99) / 100)} max=${dist.last}")
      // candidate survivors under various caps
      for (m <- Seq(8, 16, 32, 64)) {
        val kept = ranked.filter($"rn" <= m)
          .select(least($"pivot", $"other").as("a"),
            greatest($"pivot", $"other").as("b")).distinct().count()
        println(s"cap M=$m -> survivors=$kept " +
          f"(${kept.toDouble / nCand * 100}%.1f%% of candidates)")
      }
    }
    spark.stop()
  }
}
