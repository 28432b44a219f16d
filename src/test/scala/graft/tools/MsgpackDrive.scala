package graft.tools

import graft.functions.Msgpack
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boundary drive for the msgpack wire framing (verify-skill surface 1):
  * encodes a DataFrame through encodeFlat, prints the raw wire bytes,
  * decodes back with decodeFlat, and shows both sides.
  */
object MsgpackDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("msgpack-drive")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(3).select(col("id"),
      concat(lit("doc"), col("id")).as("name"),
      array(lit("t1"), lit("t2")).as("tags"))
    val wire = Msgpack.encodeFlat(df)
    wire.collect().foreach { r =>
      println("WIRE " + r.getAs[Array[Byte]](0)
        .map("%02x".format(_)).mkString)
    }
    val back = Msgpack.decodeFlat(wire, "msgpack", df.schema)
    back.show(truncate = false)
    println("ROUNDTRIP_EQUAL=" + (df.collect().map(_.toString).sorted
      .sameElements(back.collect().map(_.toString).sorted)))
    spark.stop()
  }
}
