package graft.functions

import graft.SparkTestBase
import graft.schema._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary path: encode→decode round-trips and reader-schema evolution
  * (the `flatten_msgpack`/`unflatten_msgpack` analog).
  */
class AvroBinarySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val personJson = """{"name":"person","type":"record","fields":[
    {"name":"FirstName","type":"string"},
    {"name":"Age","type":"int"},
    {"name":"Balance","type":"double"}]}"""

  test("encode → decode round-trip") {
    val s = Avro.create(personJson)
    val df = Seq(("John", 33, 12.5), ("Jane", 22, -3.25))
      .toDF("FirstName", "Age", "Balance")
    val bin = df.select(AvroBinary.toAvroBinary(
      struct(df.columns.map(col).toIndexedSeq: _*), s).as("b"))
    val back = bin.select(AvroBinary.fromAvroBinary(col("b"), s).as("r"))
      .select("r.*")
    assert(back.orderBy("Age").collect().toSeq ==
      Seq(Row("Jane", 22, -3.25), Row("John", 33, 12.5)))
  }

  test("decode with evolved reader: promotion + default + rename") {
    val w = Avro.create(personJson)
    val r = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"GivenName","type":"string","aliases":["FirstName"]},
      {"name":"Age","type":"long"},
      {"name":"Balance","type":"double"},
      {"name":"Tier","type":"string","default":"basic"}]}""")
    val df = Seq(("John", 33, 12.5)).toDF("FirstName", "Age", "Balance")
    val bin = df.select(AvroBinary.toAvroBinary(
      struct(df.columns.map(col).toIndexedSeq: _*), w).as("b"))
    val back = bin.select(AvroBinary.fromAvroBinary(col("b"), w, r).as("r"))
      .select("r.*")
    assert(back.columns.toSeq == Seq("GivenName", "Age", "Balance", "Tier"))
    assert(back.head() == Row("John", 33L, 12.5, "basic"))
  }

  test("nullable fields, enum, fixed, array, map round-trip") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"string*"},
      {"name":"e","type":{"type":"enum","name":"E","symbols":["X","Y"]}},
      {"name":"fx","type":{"type":"fixed","name":"F2","size":2}},
      {"name":"xs","type":{"type":"array","items":"long"}},
      {"name":"m","type":{"type":"map","values":"string"}}]}""")
    val df = Seq(
      (Some("v"), "Y", Array[Byte](1, 2), Seq(1L, 2L), Map("k" -> "v")),
      (None, "X", Array[Byte](3, 4), Seq.empty[Long], Map.empty[String, String]))
      .toDF("a", "e", "fx", "xs", "m")
    val bin = df.select(AvroBinary.toAvroBinary(
      struct(df.columns.map(col).toIndexedSeq: _*), s).as("b"))
    val back = bin.select(AvroBinary.fromAvroBinary(col("b"), s).as("r"))
      .select("r.*")
    val rows = back.orderBy("e").collect()
    assert(rows(0).getString(1) == "X")
    assert(rows(0).isNullAt(0))
    assert(rows(1).getString(0) == "v")
    assert(rows(1).getSeq[Long](3).toList == List(1L, 2L))
    assert(rows(1).getMap[String, String](4).toMap == Map("k" -> "v"))
    assert(rows(1).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2))
  }

  test("union of scalars round-trips through struct form") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"u","type":["null","int","string"]},
      {"name":"k","type":"int"}]}""")
    val sparkT = SchemaConverters.toStructType(s, s.rootRecord)
    val rows = Seq(
      Row(Row(1, 42, null), 1), // int branch
      Row(Row(2, null, "hi"), 2), // string branch
      Row(Row(0, null, null), 3)) // null branch
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), sparkT)
    val bin = df.select(col("k"), AvroBinary.toAvroBinary(col("u"),
      schemaOf(s, "u")).as("b"))
    val back = bin.select(col("k"),
      AvroBinary.fromAvroBinary(col("b"), schemaOf(s, "u")).as("u"))
      .orderBy("k").collect()
    assert(back(0).getStruct(1) == Row(1, 42, null))
    assert(back(1).getStruct(1) == Row(2, null, "hi"))
    assert(back(2).getStruct(1) == Row(0, null, null))
  }

  /** Sub-schema handle for a single field's type. */
  private def schemaOf(s: AvroSchema, field: String): AvroSchema =
    s.subSchema(s.rootRecord.fields.find(_.name == field).get.tpe)
}
