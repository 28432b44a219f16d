package graft.tools
import graft.schema.Avro
import graft.ops.{ConvertValue, FlattenOps, XFlatten}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ConvertDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // opsSerialized over real events
    val c = FlattenOps.compile(graft.Queries.propsSchema)
      .fold(e => sys.error(e), identity)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val ser = ev.select(col("event_id"),
      XFlatten.opsSerialized(c, n => ev(n)).as("ops_json"))
    println("SER=" + ser.orderBy("event_id").head().getString(1))
    // probe: 200-deep recursive value through ConvertValue
    val node = Avro.create("""{"name":"node","type":"record","fields":[
      {"name":"next","type":["null","node"]},{"name":"label","type":"string"}]}""")
    val cn = FlattenOps.compile(node).fold(e => sys.error(e), identity)
    var deep: Any = null
    (1 to 200).foreach { i =>
      deep = Map("label" -> s"L$i",
        "next" -> (if (deep == null) null else Map("node" -> deep)))
    }
    val flat = ConvertValue.flatten(cn, deep)
    println("DEEP_OK=" + flat.isRight)
    val rt = flat.flatMap(t => ConvertValue.unflatten(cn, t))
    println("DEEP_RT=" + (rt.isRight && rt == ConvertValue.unflatten(cn, flat.toOption.get)))
    // probe: wrong service-field arity
    println("SF_ARITY=" + ConvertValue.unflatten(c, Seq(1L)).swap.getOrElse("?"))
    spark.stop()
  }
}
