package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    (1 to 4).foreach { i =>
      time(s"native $i") {
        docs.select(graft.pipeline.TextAnalysis.langId($"text").as("l"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"tree   $i") {
        docs.select(graft.pipeline.TextAnalysis
            .langIdColumnTree($"text").as("l"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
