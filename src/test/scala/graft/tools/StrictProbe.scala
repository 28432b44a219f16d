package graft.tools
import graft.schema.Avro
import graft.ops.Validate
import org.apache.spark.sql.SparkSession
object StrictProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"long"},{"name":"b","type":"string"}]}""")
    // probe: empty input
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    println("P_EMPTY=" + Validate.strict(s, empty).count())
    // probe: extra column not in schema → Unknown field per row
    val extra = Seq((1L, "x", 9.9)).toDF("a", "b", "zz")
    val r = Validate.strict(s, extra).select("_valid", "_error").head()
    println("P_EXTRA=" + r)
    spark.stop()
  }
}
