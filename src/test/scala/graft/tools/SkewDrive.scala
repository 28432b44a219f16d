package graft.tools
import graft.pipeline.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SkewDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      .config("spark.sql.adaptive.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // hot-keyed orders: 90% map to one customer
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(when(col("o_orderkey") % 10 === 0, col("o_custkey"))
        .otherwise(lit(7L)).as("c_custkey"), col("o_totalprice"))
    val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val plain = orders.join(cust, "c_custkey")
    val salted = Skew.saltedJoin(orders, cust, "c_custkey", salts = 8)
    println("PLAIN_COUNT=" + plain.count())
    println("SALTED_COUNT=" + salted.count())
    // per-partition balance of the salted join's shuffle
    val sizes = salted.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("SALTED_PART_MAX=" + sizes.max + " NONZERO=" + sizes.count(_ > 0))
    val plainSizes = plain.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println("PLAIN_PART_MAX=" + plainSizes.max)
    spark.stop()
  }
}
