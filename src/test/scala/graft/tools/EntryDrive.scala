package graft.tools
import org.apache.spark.sql.SparkSession
object EntryDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(10, false)
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
