package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from test/ddt_suite/record_default.lua — defaults on
  * nullable fields, record-valued defaults, and defaults applied INSIDE
  * an applied default.
  */
class RecordDefaultGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  test("nullable field with non-null default") {
    val c = compiled("""{"type":"record","name":"Frob","fields":[
      {"name":"foo","type":"int*","default":42},
      {"name":"bar","type":"string"}]}""")
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(42L, "str")))
    assert(ConvertValue.unflatten(c, Vector(null, "str")) ==
      Right(Map("foo" -> null, "bar" -> "str")))
  }

  test("nullable field with null default") {
    val c = compiled("""{"type":"record","name":"Frob","fields":[
      {"name":"foo","type":"int*","default":null},
      {"name":"bar","type":"string"}]}""")
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(null, "str")))
    assert(ConvertValue.unflatten(c, Vector(42L, "str")) ==
      Right(Map("foo" -> 42L, "bar" -> "str")))
  }

  private val recDefault = """{"type":"record","name":"Frob","fields":[
    {"name":"foo","type":{"type":"record*","name":"default_record",
      "fields":[
        {"name":"f1","type":"int"},
        {"name":"f2","type":"int"},
        {"name":"f3","type":{"type":"record*","name":"default_record_2",
          "fields":[{"name":"f3_1","type":"int*"}]}}]},
     "default":{"f1":1,"f2":2}},
    {"name":"bar","type":"string"}]}"""

  test("record-valued default flattens to a subarray") {
    val c = compiled(recDefault)
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(Vector(1L, 2L, null), "str")))
    assert(ConvertValue.unflatten(c, Vector(null, "str")) ==
      Right(Map("foo" -> null, "bar" -> "str")))
  }

  test("nullable record with null default") {
    val c = compiled(recDefault.replace(""""default":{"f1":1,"f2":2}""",
      """"default":null"""))
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(null, "str")))
    assert(ConvertValue.unflatten(c,
      Vector(Vector(1L, 2L, null), "str")) ==
      Right(Map("foo" -> Map("f1" -> 1L, "f2" -> 2L, "f3" -> null),
        "bar" -> "str")))
  }

  test("default inside of an applied default (nested field default)") {
    val c = compiled("""{"type":"record","name":"Frob","fields":[
      {"name":"foo","type":{"type":"record*","name":"default_record",
        "fields":[
          {"name":"f1","type":"int"},
          {"name":"f2","type":"int"},
          {"name":"f3","type":{"type":"record*","name":"default_record_2",
            "fields":[{"name":"f3_1","type":"int*"}]},
           "default":{"f3_1":3}}]},
       "default":{"f1":1,"f2":2}},
      {"name":"bar","type":"string"}]}""")
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(Vector(1L, 2L, Vector(3L)), "str")))
    assert(ConvertValue.flatten(c,
      Map("foo" -> Map("f1" -> 5L, "f2" -> 7L), "bar" -> "str")) ==
      Right(Vector(Vector(5L, 7L, Vector(3L)), "str")))
    assert(ConvertValue.flatten(c,
      Map("foo" -> Map("f1" -> 5L, "f2" -> 7L, "f3" -> null),
        "bar" -> "str")) ==
      Right(Vector(Vector(5L, 7L, null), "str")))
  }

  test("default of a field inside an empty present record") {
    val c = compiled("""{"type":"record","name":"Frob","fields":[
      {"name":"foo","type":{"type":"record*","name":"default_record",
        "fields":[
          {"name":"f1","type":"int"},
          {"name":"f2","type":"int"},
          {"name":"f3","type":{"type":"record*","name":"default_record_2",
            "fields":[{"name":"f3_1","type":"int*","default":3}]}}]},
       "default":{"f1":1,"f2":2,"f3":null}},
      {"name":"bar","type":"string"}]}""")
    assert(ConvertValue.flatten(c, Map("bar" -> "str")) ==
      Right(Vector(Vector(1L, 2L, null), "str")))
    assert(ConvertValue.flatten(c,
      Map("foo" -> Map("f1" -> 5L, "f2" -> 7L,
        "f3" -> Map.empty[String, Any]), "bar" -> "str")) ==
      Right(Vector(Vector(5L, 7L, Vector(3L)), "str")))
  }
}
