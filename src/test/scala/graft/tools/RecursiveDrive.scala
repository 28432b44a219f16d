package graft.tools
import graft.schema.{Avro, SchemaConverters}
import graft.ops.{ConvertValue, FlattenOps}
import org.apache.spark.sql.{Row, SparkSession}
object RecursiveDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = Avro.create("""{"name":"node","type":"record","fields":[
      {"name":"next","type":["null","node"]},{"name":"label","type":"string"}]}""")
    val st = SchemaConverters.toStructType(s, s.rootRecord)
    println("TYPE_DEPTH=" + st.treeString.linesIterator.count(_.contains("next")))
    val c = FlattenOps.compile(s).fold(e => sys.error(e), identity)
    // chain of depth 3 through the DataFrame path
    def chain(n: Int): Row =
      if (n == 0) null else Row(chain(n - 1), s"L$n")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(chain(3), Row(null, "solo"))), st)
    val flat = c.flatten(df).orderBy("label")
    flat.show(false)
    val back = c.unflatten(c.flatten(df)).orderBy("label")
    back.show(false)
    // probe: data DEEPER than MaxRecursionDepth (truncation boundary).
    // The static type bottoms out at depth 5, so a 5-deep chain cannot be
    // expressed in a DataFrame row at all — confirm createDataFrame rejects
    // it rather than corrupting, and that ConvertValue (no limit) handles it
    try {
      val deepDf = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(chain(7))), st)
      deepDf.collect()
      println("PROBE_DEEP=accepted (?)")
    } catch { case e: Throwable =>
      println("PROBE_DEEP=rejected " + e.getClass.getSimpleName) }
    var deep: Any = null
    (1 to 50).foreach(i => deep = Map("label" -> s"L$i",
      "next" -> (if (deep == null) null else Map("node" -> deep))))
    println("PROBE_CONVERTVALUE_50=" + ConvertValue.flatten(c, deep).isRight)
    spark.stop()
  }
}
