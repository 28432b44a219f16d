package graft.tools
import graft.schema.{Avro, SchemaConverters}
import graft.ops.{ConvertValue, FlattenOps}
import org.apache.spark.sql.{Row, SparkSession}
object UnionDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"u","type":["null","int","string","double"]},
      {"name":"k","type":"int"}]}""")
    val c = FlattenOps.compile(s).fold(e => sys.error(e), identity)
    val st = SchemaConverters.toStructType(s, s.rootRecord)
    val rows = Seq(
      Row(Row(1, 42, null, null), 1), Row(Row(2, null, "hi", null), 2),
      Row(Row(3, null, null, 9.5), 3), Row(Row(0, null, null, null), 4))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), st)
    val rt = c.unflatten(c.flatten(df)).orderBy("k")
    rt.show(false)
    // cross-check against the record-at-a-time path on the same values
    println("CV=" + ConvertValue.flatten(c,
      Map("u" -> Map("double" -> 9.5), "k" -> 3L)))
    // probe: DataFrame flatten agrees with ConvertValue tuple shape
    val flat = c.flatten(df).orderBy("k").collect()
    println("DF_TAG3=" + flat(2).getInt(0) + " DF_DOUBLE=" +
      flat(2).getStruct(1).getDouble(3))
    spark.stop()
  }
}
