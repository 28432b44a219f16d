package graft.tools
import graft.pipeline.CacheScope
import org.apache.spark.sql.SparkSession
object SimhashIndexTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.Queries.queries("simhash_index_documents")(spark,
        "/root/testdata/sf0.1").count()
      println(f"simhash_index run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      CacheScope.releaseSession(spark)
    }
    spark.stop()
  }
}
