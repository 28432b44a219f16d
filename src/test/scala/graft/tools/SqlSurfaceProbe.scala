package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    import graft.pipeline.TextAnalysis._
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "token_count" -> tokenCount(col("text")),
      "token_estimate" -> tokenEstimate(col("text")),
      "quality" -> qualityScore(col("text")),
      "langid" -> langId(col("text")))
    cases.foreach { case (tag, c) =>
      (1 to 3).foreach { i =>
        time(s"$tag $i") {
          docs.select(c.as("x")).write.format("noop")
            .mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
