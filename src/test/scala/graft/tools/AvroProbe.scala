package graft.tools
import graft.schema.Avro
import graft.functions.AvroBinary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AvroProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"long"},{"name":"b","type":"string"}]}""")
    // probe 1: corrupted bytes
    val bad = Seq(Array[Byte](1,2,3)).toDF("b")
    try {
      bad.select(AvroBinary.fromAvroBinary(col("b"), s).as("r")).collect()
      println("P_CORRUPT=no error (!)")
    } catch { case e: Throwable =>
      println("P_CORRUPT=caught " + e.getClass.getSimpleName) }
    // probe 2: null binary input
    val nul = Seq[Option[Array[Byte]]](None).toDF("b")
    val r2 = nul.select(AvroBinary.fromAvroBinary(col("b"), s).as("r")).collect()
    println("P_NULL=" + r2.head.get(0))
    // probe 3: datum-reuse correctness — 1000 distinct rows through one
    // thread must all decode distinctly (reuse must not alias rows)
    val df = spark.range(1000).coalesce(1).select(
      AvroBinary.toAvroBinary(struct(col("id").as("a"),
        concat(lit("s"), col("id")).as("b")), s).as("bin"))
    val back = df.select(AvroBinary.fromAvroBinary(col("bin"), s).as("r"))
      .select("r.*").collect()
    println("P_REUSE_DISTINCT=" + back.map(_.getString(1)).distinct.length)
    spark.stop()
  }
}
