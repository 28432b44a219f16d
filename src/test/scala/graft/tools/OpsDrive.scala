package graft.tools
import graft.schema._
import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Manual end-to-end driver for graft.ops over real testdata (used by /verify). */
object OpsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // writer schema mirrors the parquet; reader evolves: reorder + rename via
    // alias + add defaulted field + promote int->long
    val writer = Avro.create("""{"name":"customer","type":"record","fields":[
      {"name":"c_custkey","type":"long"},{"name":"c_name","type":"string"},
      {"name":"c_nationkey","type":"int"},{"name":"c_acctbal","type":"double"},
      {"name":"c_mktsegment","type":"string"}]}""")
    val reader = Avro.create("""{"name":"customer","type":"record","fields":[
      {"name":"segment","type":"string","aliases":["c_mktsegment"]},
      {"name":"c_custkey","type":"long"},
      {"name":"c_nationkey","type":"long"},
      {"name":"c_acctbal","type":"double"},
      {"name":"loyalty_tier","type":"string","default":"NONE"},
      {"name":"c_name","type":"string"}]}""")
    val c = FlattenOps.compile(writer, reader).fold(e => sys.error(e), identity)
    println("FLATNAMES=" + c.flatNames.mkString(","))
    val flat = c.flatten(cust)
    flat.orderBy("c_custkey").show(3, false)
    println("SCHEMA=" + flat.schema.map(f => f.name+":"+f.dataType.simpleString).mkString(","))
    println("PLAN_HAS_EXCHANGE=" + flat.queryExecution.executedPlan.toString.contains("Exchange"))
    // validate over events-with-forced-nulls
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("event_type", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("event_type")))
    val evSchema = Avro.create("""{"name":"event","type":"record","fields":[
      {"name":"event_id","type":"long"},{"name":"event_type","type":"string"},
      {"name":"value","type":"double"},{"name":"props","type":"string*"}]}""")
    val v = Validate(evSchema, ev.select("event_id","event_type","value","props"))
    println("INVALID_COUNT=" + v.filter(!col("_valid")).count())
    v.filter(!col("_valid")).select("event_id","_error").show(2, false)
    // xflatten partial update
    val partial = cust.select(col("c_custkey"), lit(null).cast("string").as("c_name"),
      col("c_nationkey"), lit(null).cast("double").as("c_acctbal"), col("c_mktsegment"))
    val cid = FlattenOps.compile(writer).fold(e => sys.error(e), identity)
    XFlatten(cid, partial).select("c_custkey","ops").orderBy("c_custkey").show(2, false)
    // xflatten_msgpack byte framing over the same partial update
    val mp = XFlatten.opsMsgpack(cid, partial)
      .select(col("c_custkey"), hex(col("ops_msgpack")).as("ops_hex"))
      .orderBy("c_custkey")
    mp.show(2, false)
    val firstBytes = XFlatten.opsMsgpack(cid, partial).orderBy("c_custkey")
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    println("MSGPACK_DECODED=" + graft.functions.Msgpack.decode(firstBytes))
    spark.stop()
  }
}
