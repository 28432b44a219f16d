package graft.tools
import graft.Queries
import graft.functions.AvroBinary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AvroProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name%-18s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select("event_id", "event_type", "value")
    t("scan") { ev.write.format("noop").mode("overwrite").save() }
    val bin = ev.select(AvroBinary.toAvroBinary(
      struct(col("event_id"), col("event_type"), col("value")),
      Queries.eventsWriter).as("b"))
    t("encode") { bin.write.format("noop").mode("overwrite").save() }
    val dec = bin.select(AvroBinary.fromAvroBinary(col("b"),
      Queries.eventsWriter, Queries.eventsReader).as("r")).select("r.*")
    t("encode+decode") { dec.write.format("noop").mode("overwrite").save() }
    t("`+orderBy") { dec.orderBy("event_id").write.format("noop").mode("overwrite").save() }
    println("ROWS=" + ev.count())
    spark.stop()
  }
}
