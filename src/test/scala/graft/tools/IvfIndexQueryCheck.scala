package graft.tools
import org.apache.spark.sql.SparkSession
object IvfIndexQueryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries("similarity_ivf_index_topk")(spark, "/root/testdata/sf0.01")
    df.show(10, false)
    val plan = df.queryExecution.executedPlan.toString
    println("HAS_PARTITION_FILTERS=" + plan.contains("PartitionFilters: [cid"))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    println("PF_LINE=" + pf.trim.take(120))
    spark.stop()
  }
}
