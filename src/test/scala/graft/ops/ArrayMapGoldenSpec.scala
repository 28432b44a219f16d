package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from the reference's array/map DDT bundles
  * (test/ddt_suite/array.lua — 38 cases; map.lua — 27): root-schema
  * flatten/unflatten, element type errors with 1-based / keyed paths,
  * nullable variants, arrays of nullable records.
  */
class ArrayMapGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private val intArray = compiled("""{"type":"array","items":"int"}""")
  private val stringArray = compiled("""{"type":"array","items":"string"}""")
  private val stringArrayArray = compiled(
    """{"type":"array","items":{"type":"array","items":"string"}}""")
  private val stringArrayNullable = compiled(
    """{"type":"array*","items":"string"}""")
  private val itemsNullable = compiled(
    """{"type":"array","items":"string*"}""")

  test("array.lua: root array flatten wraps in one slot") {
    assert(ConvertValue.flatten(intArray, Vector.empty) ==
      Right(Vector(Vector.empty)))
    assert(ConvertValue.flatten(intArray, (1L to 10L).toVector) ==
      Right(Vector((1L to 10L).toVector)))
    assert(ConvertValue.flatten(stringArray, Vector("1", "2", "3")) ==
      Right(Vector(Vector("1", "2", "3"))))
    assert(ConvertValue.flatten(stringArrayArray,
      Vector(Vector.empty, Vector("1"), Vector("2", "3"))) ==
      Right(Vector(Vector(Vector.empty, Vector("1"), Vector("2", "3")))))
  }

  test("array.lua: root type errors (Expecting ARRAY, encountered X)") {
    assert(ConvertValue.flatten(intArray, null) ==
      Left("Expecting ARRAY, encountered NIL"))
    assert(ConvertValue.flatten(intArray, false) ==
      Left("Expecting ARRAY, encountered FALSE"))
    assert(ConvertValue.flatten(intArray, true) ==
      Left("Expecting ARRAY, encountered TRUE"))
    assert(ConvertValue.flatten(intArray, 42L) ==
      Left("Expecting ARRAY, encountered LONG"))
    assert(ConvertValue.flatten(intArray, 42.0) ==
      Left("Expecting ARRAY, encountered DOUBLE"))
    assert(ConvertValue.flatten(intArray, "Hello, array!") ==
      Left("Expecting ARRAY, encountered STR"))
    assert(ConvertValue.flatten(intArray, Map("key" -> 42L)) ==
      Left("Expecting ARRAY, encountered MAP"))
  }

  test("array.lua: element errors carry 1-based index paths") {
    assert(ConvertValue.flatten(intArray, Vector(42.0)) ==
      Left("1: Expecting INT, encountered DOUBLE"))
    assert(ConvertValue.flatten(intArray,
      Vector[Any](1L, 2L, 3L, 4L, 5.1)) ==
      Left("5: Expecting INT, encountered DOUBLE"))
    assert(ConvertValue.flatten(stringArray, Vector(42L)) ==
      Left("1: Expecting STR, encountered LONG"))
    assert(ConvertValue.flatten(stringArray,
      Vector("1", "2", "3", "4", 5L)) ==
      Left("5: Expecting STR, encountered LONG"))
    assert(ConvertValue.flatten(stringArrayArray, Vector(Vector(42L))) ==
      Left("1/1: Expecting STR, encountered LONG"))
  }

  test("array.lua: unflatten restores the array from its slot") {
    assert(ConvertValue.unflatten(stringArray,
      Vector(Vector("hello", "world"))) ==
      Right(Vector("hello", "world")))
    assert(ConvertValue.unflatten(stringArrayNullable,
      Vector(Vector("hello", "world"))) ==
      Right(Vector("hello", "world")))
    assert(ConvertValue.unflatten(stringArrayNullable, Vector(null)) ==
      Right(null))
  }

  test("array.lua: nullable items round-trip") {
    assert(ConvertValue.flatten(itemsNullable, Vector(null, null)) ==
      Right(Vector(Vector(null, null))))
    assert(ConvertValue.unflatten(itemsNullable,
      Vector(Vector(null, "hello"))) == Right(Vector(null, "hello")))
    assert(ConvertValue.flatten(itemsNullable, Vector(null, "hello")) ==
      Right(Vector(Vector(null, "hello"))))
  }

  test("array.lua: array of nullable records flattens per element") {
    val c = compiled("""{"type":"array","items":{
      "type":"record*","name":"X","fields":[
        {"name":"f1","type":"string*"},
        {"name":"f2","type":"string*"},
        {"name":"f3","type":"string*"}]}}""")
    val in = Vector(Map("f1" -> "1"), Map("f2" -> "2"), null,
      Map("f3" -> "3"))
    val flat = ConvertValue.flatten(c, in)
    assert(flat == Right(Vector(Vector(
      Vector("1", null, null), Vector(null, "2", null), null,
      Vector(null, null, "3")))))
    val back = ConvertValue.unflatten(c, flat.toOption.get)
    assert(back.toOption.get.asInstanceOf[Vector[Any]](2) == null)
    assert(back.toOption.get.asInstanceOf[Vector[Any]](0)
      .asInstanceOf[Map[String, Any]] ==
      Map("f1" -> "1", "f2" -> null, "f3" -> null))
  }

  private val intMap = compiled("""{"type":"map","values":"int"}""")
  private val stringMapMap = compiled(
    """{"type":"map","values":{"type":"map","values":"string"}}""")
  private val intMapNullable = compiled("""{"type":"map*","values":"int"}""")

  test("map.lua: root map flatten wraps in one slot") {
    assert(ConvertValue.flatten(intMap, Map.empty[String, Any]) ==
      Right(Vector(Map.empty)))
    assert(ConvertValue.flatten(intMap, Map("a" -> 1L, "b" -> 2L)) ==
      Right(Vector(Map("a" -> 1L, "b" -> 2L))))
    assert(ConvertValue.flatten(stringMapMap,
      Map("1" -> Map.empty, "2" -> Map("a" -> "1"))) ==
      Right(Vector(Map("1" -> Map.empty, "2" -> Map("a" -> "1")))))
  }

  test("map.lua: type and value errors with key paths") {
    assert(ConvertValue.flatten(intMap, 42L) ==
      Left("Expecting MAP, encountered LONG"))
    assert(ConvertValue.flatten(intMap, Map("e" -> "5")) ==
      Left("e: Expecting INT, encountered STR"))
    assert(ConvertValue.flatten(stringMapMap, Map("a" -> 1L)) ==
      Left("a: Expecting MAP, encountered LONG"))
    assert(ConvertValue.flatten(stringMapMap, Map("a" -> Map("b" -> 1L))) ==
      Left("a/b: Expecting STR, encountered LONG"))
  }

  test("map.lua: nullable map root") {
    assert(ConvertValue.flatten(intMapNullable, null) ==
      Right(Vector(null)))
    assert(ConvertValue.flatten(intMapNullable, Map("a" -> 1L)) ==
      Right(Vector(Map("a" -> 1L))))
    assert(ConvertValue.unflatten(intMapNullable, Vector(null)) ==
      Right(null))
  }
}
