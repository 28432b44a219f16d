package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpePlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.Queries.bpeFixtureModel
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.functions.BpeExpressions.bpeCountC(coalesce(col("text"),lit("")), m).as("n"))
    df.explain("formatted")
    println("SUM=" + df.agg(sum("n")).collect()(0))
    spark.stop()
  }
}
