package graft.ops

import graft.schema._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden matrix from test/ddt_suite/service_fields.lua (56 cases):
  * per service-field type — flatten prepends, unflatten returns the
  * prefix values, slots are type-guarded with 1-based paths, length
  * mismatches use the ARRAY-length error.
  */
class ServiceFieldsGoldenSpec extends AnyFunSuite {

  private val simpleJson = """{"name":"simple","type":"record","fields":[
    {"name":"A","type":"string","default":"Simple "},
    {"name":"B","type":"int","default":1234}]}"""

  private def compiled(sf: Seq[DataType]): Compiled = {
    val s = Avro.create(simpleJson)
    FlattenOps.compile(s, s, downgrade = false, sf)
      .fold(e => sys.error(e), identity)
  }

  // (type, good value, expected echo, bad value, error token)
  private val matrix: Seq[(DataType, Any, Any, Any, String)] = Seq(
    (BooleanType, true, true, 42L, "BOOL"),
    (IntegerType, 19L, 19L, "s", "INT"),
    (LongType, 23L, 23L, "s", "LONG"),
    (FloatType, 1.5, 1.5, true, "FLOAT"),
    (DoubleType, 2.5, 2.5, true, "DOUBLE"),
    (StringType, "sf", "sf", 42L, "STR"),
    (BinaryType, "b".getBytes, "b".getBytes, 42L, "BIN"))

  test("service_fields.lua: flatten prepends each type") {
    matrix.foreach { case (dt, good, _, _, _) =>
      val c = compiled(Seq(dt))
      assert(ConvertValue.flatten(c, Map.empty[String, Any], Seq(good)) ==
        Right(Vector(good, "Simple ", 1234L)), dt)
    }
  }

  test("service_fields.lua: unflatten returns prefix and object") {
    matrix.foreach { case (dt, good, echo, _, _) =>
      val c = compiled(Seq(dt))
      val r = ConvertValue.unflattenWithServiceFields(c,
        Vector(good, "Hello, world!", 42L))
      assert(r.isRight, s"$dt: $r")
      val (obj, sf) = r.toOption.get
      assert(obj == Map("A" -> "Hello, world!", "B" -> 42L))
      (echo, sf.head) match {
        case (e: Array[Byte], g: Array[Byte]) => assert(e.sameElements(g))
        case (e, g) => assert(e == g, dt)
      }
    }
  }

  test("service_fields.lua: length and slot-type errors") {
    matrix.foreach { case (dt, _, _, bad, tok) =>
      val c = compiled(Seq(dt))
      assert(ConvertValue.unflatten(c, Vector("Hello, world!", 42L)) ==
        Left("Expecting ARRAY of length 3. " +
          "Encountered ARRAY of length 2."), dt)
      assert(ConvertValue.unflatten(c,
        Vector(true, "Hello, world!", 42L, "")) ==
        Left("Expecting ARRAY of length 3. " +
          "Encountered ARRAY of length 4."), dt)
      val r = ConvertValue.unflatten(c, Vector(bad, "Hello, world!", 42L))
      assert(r.isLeft && r.swap.toOption.get.startsWith(
        s"1: Expecting $tok, encountered "), s"$dt: $r")
    }
  }

  test("service_fields.lua: multiple prefix slots, NIL rejected per slot") {
    val c = compiled(Seq(IntegerType, StringType))
    assert(ConvertValue.flatten(c, Map.empty[String, Any],
      Seq(7L, "tag")) == Right(Vector(7L, "tag", "Simple ", 1234L)))
    assert(ConvertValue.unflatten(c,
      Vector(null, "tag", "x", 1L)) ==
      Left("1: Expecting INT, encountered NIL"))
    assert(ConvertValue.unflatten(c,
      Vector(7L, null, "x", 1L)) ==
      Left("2: Expecting STR, encountered NIL"))
  }
}
