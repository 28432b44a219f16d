package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures SimHash candidate counts / recall vs the exact n-gram pair set
  * at a given SF — picks the blocks / hamming-prefilter operating point.
  */
object SimhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("simhash-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val docs = d.select(col("doc_id"), col("text"))
      .union(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zz qq xx")).as("text")))
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8, maxDocFreq = 0)
      .select("id_a", "id_b").cache()
    val nTruth = truth.count()
    for (blocks <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      val cand = Dedup.simhashCandidatePairs(docs, "doc_id", "text", blocks)
        .cache()
      val nCand = cand.count()
      val found = truth.join(cand, Seq("id_a", "id_b")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"BLOCKS=$blocks cand=$nCand truthFound=$found/$nTruth ${secs}%.1fs")
      if (found > 0) {
        val ham = cand.join(truth, Seq("id_a", "id_b"))
          .agg(max("hamming"), avg("hamming")).head()
        println(s"BLOCKS=$blocks true-pair hamming max=${ham.get(0)} avg=${ham.get(1)}")
      }
      cand.unpersist()
    }
    spark.stop()
  }
}
