package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from test/ddt_suite/union_versions.lua: root unions under
  * schema evolution — tags re-map to READER branch order, keys absent
  * from the reader get the `(schema versioning)` suffix, and scalars
  * evolve into/out of unions.
  */
class UnionVersionsGoldenSpec extends AnyFunSuite {

  private val v1 = """["null", "int", "double"]"""
  private val v2 = """["null", "string", "int"]"""

  private def compiled2(w: String, r: String): Compiled =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(e => sys.error(e), identity)

  test("flatten v1->v2: tags use reader branch order") {
    val c = compiled2(v1, v2)
    assert(ConvertValue.flatten(c, null) == Right(Vector(0, null)))
    assert(ConvertValue.flatten(c, Map("int" -> 42L)) ==
      Right(Vector(2, 42L)))
    assert(ConvertValue.flatten(c, Map("string" -> "42")) ==
      Left("Unknown key: \"string\""))
    assert(ConvertValue.flatten(c, Map("double" -> 42.0)) ==
      Left("Unknown key: \"double\" (schema versioning)"))
  }

  test("flatten v2->v1: suffix marks keys dropped by the reader") {
    val c = compiled2(v2, v1)
    assert(ConvertValue.flatten(c, null) == Right(Vector(0, null)))
    assert(ConvertValue.flatten(c, Map("int" -> 42L)) ==
      Right(Vector(1, 42L)))
    assert(ConvertValue.flatten(c, Map("string" -> "42")) ==
      Left("Unknown key: \"string\" (schema versioning)"))
    assert(ConvertValue.flatten(c, Map("double" -> 42.0)) ==
      Left("Unknown key: \"double\""))
  }

  test("scalar evolves into / out of a union") {
    val into = compiled2("\"int\"", v1)
    assert(ConvertValue.flatten(into, 42L) == Right(Vector(1, 42L)))
    assert(ConvertValue.unflatten(into, Vector(42L)) ==
      Right(Map("int" -> 42L)))
    val outof = compiled2(v1, "\"int\"")
    assert(ConvertValue.flatten(outof, Map("int" -> 42L)) ==
      Right(Vector(42L)))
    assert(ConvertValue.unflatten(outof, Vector(1, 42L)) == Right(42L))
  }

  test("scalar→union evolution works nested inside arrays") {
    val w = """{"name":"r","type":"record","fields":[
      {"name":"xs","type":{"type":"array","items":"int"}}]}"""
    val r = """{"name":"r","type":"record","fields":[
      {"name":"xs","type":{"type":"array","items":["null","int"]}}]}"""
    val c = compiled2(w, r)
    val flat = ConvertValue.flatten(c, Map("xs" -> Vector(1L, 2L)))
    assert(flat.isRight, flat)
    val back = ConvertValue.unflatten(c, Vector(Vector(1L, 2L)))
    assert(back.isRight, back)
  }

  test("multi-key union map with non-string keys fails gracefully") {
    val s = Avro.create("""["null","string"]""")
    val res = ValidateValue.validate(s, Map(1 -> "a", 2 -> "b"))
    assert(res.isLeft, res)
    assert(res.swap.toOption.get.contains("Non-string map key"), res)
  }

  test("unflatten: writer tags re-map; dropped branches error with suffix") {
    val c12 = compiled2(v1, v2)
    assert(ConvertValue.unflatten(c12, Vector(0, null)) == Right(null))
    assert(ConvertValue.unflatten(c12, Vector(1, 42L)) ==
      Right(Map("int" -> 42L)))
    assert(ConvertValue.unflatten(c12, Vector[Any](2, 42.0)) ==
      Left("1: Bad value: 2 (schema versioning)"))
    val c21 = compiled2(v2, v1)
    assert(ConvertValue.unflatten(c21, Vector(0, null)) == Right(null))
    assert(ConvertValue.unflatten(c21, Vector(1, "42")) ==
      Left("1: Bad value: 1 (schema versioning)"))
    assert(ConvertValue.unflatten(c21, Vector(2, 42L)) ==
      Right(Map("int" -> 42L)))
  }
}
