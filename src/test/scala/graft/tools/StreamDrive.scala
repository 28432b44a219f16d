package graft.tools
import graft.schema.Avro
import graft.ops.FlattenOps
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Live streaming drive for /verify: rate source → flatten+validate →
  * console-visible memory sink, exercising a real continuous query. */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val w = Avro.create("""{"name":"e","type":"record","fields":[
      {"name":"event_id","type":"long"},{"name":"etype","type":"string"}]}""")
    val r = Avro.create("""{"name":"e","type":"record","fields":[
      {"name":"kind","type":"string","aliases":["etype"]},
      {"name":"event_id","type":"long"},
      {"name":"chan","type":"string","default":"live"}]}""")
    val c = FlattenOps.compile(w, r).fold(e => sys.error(e), identity)
    // REAL unbounded source: rate stream at 500 rows/s
    val src = spark.readStream.format("rate").option("rowsPerSecond", "500")
      .load()
      .select(col("value").as("event_id"),
        concat(lit("type"), col("value") % 3).as("etype"))
    val q = StreamOps.flattenStream(c, src)
      .writeStream.format("memory").queryName("live").outputMode("append")
      .start()
    Thread.sleep(5000)
    q.processAllAvailable()
    q.stop()
    val t = spark.table("live")
    println("STREAM_COLS=" + t.columns.mkString(","))
    println("STREAM_ROWS=" + t.count())
    t.orderBy("event_id").show(3, false)
    spark.stop()
  }
}
