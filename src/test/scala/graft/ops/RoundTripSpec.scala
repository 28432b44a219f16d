package graft.ops

import graft.SparkTestBase
import graft.schema._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import scala.util.Random

/** Property: `unflatten(flatten(x)) == x` for any schema and matching data
  * (SURVEY §5 test plan — the round-trip law the reference pins via its DDT
  * corpus). Schemas and rows are generated, not hand-picked.
  */
class RoundTripSpec extends AnyFunSuite with SparkTestBase {

  private val fieldTypeGen: Gen[(String, JValue => JValue)] = Gen.oneOf(
    Gen.const(("\"int\"", identity[JValue] _)),
    Gen.const(("\"long\"", identity[JValue] _)),
    Gen.const(("\"double\"", identity[JValue] _)),
    Gen.const(("\"string\"", identity[JValue] _)),
    Gen.const(("\"boolean\"", identity[JValue] _)),
    Gen.const(("\"string*\"", identity[JValue] _)),
    Gen.const(("[\"null\",\"long\"]", identity[JValue] _)),
    Gen.const(("{\"type\":\"array\",\"items\":\"int\"}", identity[JValue] _)))

  private def randomValue(tpe: String, rnd: Random): Any = tpe match {
    case "\"int\"" => rnd.nextInt()
    case "\"long\"" => rnd.nextLong()
    case "\"double\"" => rnd.nextDouble() * 1e6
    case "\"string\"" => rnd.alphanumeric.take(rnd.nextInt(12)).mkString
    case "\"boolean\"" => rnd.nextBoolean()
    case "\"string*\"" =>
      if (rnd.nextBoolean()) null else rnd.alphanumeric.take(5).mkString
    case "[\"null\",\"long\"]" =>
      if (rnd.nextBoolean()) null else rnd.nextLong()
    case _ => Seq.fill(rnd.nextInt(4))(rnd.nextInt()): Seq[Int]
  }

  test("unflatten(flatten(x)) == x over generated scalar-record schemas") {
    val rnd = new Random(42)
    (1 to 15).foreach { trial =>
      val nFields = 1 + rnd.nextInt(6)
      val types = Vector.fill(nFields)(
        fieldTypeGen.sample.get._1)
      val fieldsJson = types.zipWithIndex.map { case (t, i) =>
        s"""{"name":"f$i","type":$t}""" }.mkString(",")
      val schema = Avro.create(
        s"""{"name":"r$trial","type":"record","fields":[$fieldsJson]}""")
      val c = FlattenOps.compile(schema).toOption.get
      val sparkT = SchemaConverters.toStructType(schema, schema.rootRecord)
      val rows = (1 to 8).map { _ =>
        Row.fromSeq(types.map(t => randomValue(t, rnd)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), sparkT)
      val flat = c.flatten(df)
      val back = c.unflatten(flat)
      // nullable-scalar unions decode back to the same nullable column
      val orig = df.collect().toSeq.map(normalize)
      val rt = back.collect().toSeq.map(normalize)
      assert(rt.toSet == orig.toSet,
        s"round-trip mismatch for schema: $types")
      // width contract: flat column count == getNames length
      assert(flat.columns.length == schema.getNames().length)
    }
  }

  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case s: scala.collection.Seq[_] => s.toList
    case x => x
  }

  test("validate accepts what flatten round-trips (ValidateValue law)") {
    val rnd = new Random(7)
    (1 to 10).foreach { trial =>
      val schema = Avro.create(
        s"""{"name":"v$trial","type":"record","fields":[
          {"name":"a","type":"long"},{"name":"b","type":"string*"},
          {"name":"c","type":["null","double"]}]}""")
      val data = Map(
        "a" -> rnd.nextLong(),
        "b" -> (if (rnd.nextBoolean()) null else "x"),
        // union values take the reference's single-key-map form
        "c" -> (if (rnd.nextBoolean()) null
                else Map("double" -> rnd.nextDouble())))
      val res = ValidateValue.validate(schema, data)
      assert(res.isRight, s"validate failed: $res")
    }
  }
}
