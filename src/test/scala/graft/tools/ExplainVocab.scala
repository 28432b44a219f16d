package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan check for the vocabulary/tfidf operators: the vocab top-k must
  * be TakeOrderedAndProject (never a global Sort), and the tfidf rank
  * window must partition by doc_id (keyed, no single-partition window).
  */
object ExplainVocab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    println("==== vocabulary ====")
    graft.pipeline.TextAnalysis.vocabulary(docs, "doc_id", "text", 40)
      .explain("formatted")
    println("==== tfidfKeywords ====")
    graft.pipeline.TextAnalysis.tfidfKeywords(docs, "doc_id", "text", 3)
      .explain("formatted")
    spark.stop()
  }
}
