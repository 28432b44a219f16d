package graft.tools
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val all = d.select(col("doc_id"), col("text"))
      .union(d.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zz qq xx")).as("text")))
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    t("scan_union_count") { all.count() }
    val sh = all.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("sh"))
    t("shingle_hashes") { sh.write.format("noop").mode("overwrite").save() }
    val exploded = sh.select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
    t("exploded_count") { println("  rows=" + exploded.count()) }
    t("full_pairs") { Dedup.ngramJaccardPairs(all, "doc_id", "text", 0.8, maxDocFreq = 0)
      .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
