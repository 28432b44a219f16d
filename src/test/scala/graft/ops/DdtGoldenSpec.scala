package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported from the reference DDT corpus for the
  * record-at-a-time converter (reference: test/ddt_suite/union.lua,
  * record.lua, record_version.lua, enum_versions.lua, record_hidden.lua,
  * recursive.lua — via FIXTURES.md).
  */
class DdtGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private def compiled2(w: String, r: String): Compiled =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(e => sys.error(e), identity)

  // ---- union.lua:9–58 ----

  private val union3 = """["int","string","double"]"""

  private def unionRec(branches: String) =
    s"""{"name":"r","type":"record","fields":[
      {"name":"u","type":$branches}]}"""

  test("union.lua: flatten branch index + value") {
    val c = compiled(unionRec(union3))
    assert(ConvertValue.flatten(c, Map("u" -> Map("int" -> 42L))) ==
      Right(Vector(0, 42L)))
    assert(ConvertValue.flatten(c,
      Map("u" -> Map("string" -> "Hello, world!"))) ==
      Right(Vector(1, "Hello, world!")))
    assert(ConvertValue.flatten(c, Map("u" -> Map("double" -> 99.1))) ==
      Right(Vector(2, 99.1)))
  }

  test("union.lua: flatten error contracts") {
    val c = compiled(unionRec(union3))
    assert(ConvertValue.flatten(c, Map("u" -> Map("!!!" -> 42L))) ==
      Left("u: Unknown key: \"!!!\""))
    assert(ConvertValue.flatten(c, Map("u" -> Map.empty[String, Any])) ==
      Left("u: Expecting MAP of length 1. Encountered MAP of length 0."))
    assert(ConvertValue.flatten(c, Map("u" -> Map("int" -> "42"))) ==
      Left("u/int: Expecting INT, encountered STR"))
    assert(ConvertValue.flatten(c, Map("u" -> Map("string" -> 42L))) ==
      Left("u/string: Expecting STR, encountered LONG"))
    assert(ConvertValue.flatten(c, Map("u" -> Map("double" -> "42"))) ==
      Left("u/double: Expecting DOUBLE, encountered STR"))
  }

  test("union.lua: null branch") {
    val c = compiled(unionRec("""["null","int","string"]"""))
    assert(ConvertValue.flatten(c, Map("u" -> null)) ==
      Right(Vector(0, null)))
    assert(ConvertValue.flatten(c, Map("u" -> Map("int" -> 1L))) ==
      Right(Vector(1, 1L)))
  }

  test("union.lua: unflatten errors (positional paths)") {
    val c = compiled(unionRec(union3))
    assert(ConvertValue.unflatten(c, Seq(0, 42L)) ==
      Right(Map("u" -> Map("int" -> 42L))))
    assert(ConvertValue.unflatten(c, Seq(1L, 2L, 3L)) ==
      Left("Expecting ARRAY of length 2. Encountered ARRAY of length 3."))
    assert(ConvertValue.unflatten(c, Seq("x", 42L)) ==
      Left("1: Expecting INT, encountered STR"))
    assert(ConvertValue.unflatten(c, Seq(-1, 42L)) ==
      Left("1: Bad value: -1"))
    assert(ConvertValue.unflatten(c, Seq(123, 42L)) ==
      Left("1: Bad value: 123"))
    assert(ConvertValue.unflatten(c, Seq(1, 42L)) ==
      Left("2: Expecting STR, encountered LONG"))
  }

  // ---- record.lua F1 ----

  private val personJson = """{"name":"person","type":"record","fields":[
    {"name":"FirstName","type":"string"},{"name":"LastName","type":"string"},
    {"name":"Age","type":"int"},{"name":"Sex","type":"int"},
    {"name":"PhoneNumber","type":"string"},{"name":"HomeAddress","type":"string"},
    {"name":"Occupation","type":"string"}]}"""

  test("record.lua: person flatten in schema order + errors") {
    val c = compiled(personJson)
    val data = Map("FirstName" -> "John", "LastName" -> "Doe",
      "Age" -> 33L, "Sex" -> 1L, "PhoneNumber" -> "+7 999 1234567",
      "HomeAddress" -> "Long Street, 1", "Occupation" -> "Engineer")
    assert(ConvertValue.flatten(c, data) == Right(Vector("John", "Doe",
      33L, 1L, "+7 999 1234567", "Long Street, 1", "Engineer")))
    assert(ConvertValue.flatten(c, 42L) ==
      Left("Expecting MAP, encountered LONG"))
    assert(ConvertValue.flatten(c, data.updated("FirstName", 42L)) ==
      Left("FirstName: Expecting STR, encountered LONG"))
    assert(ConvertValue.flatten(c, data - "Age") ==
      Left("Key missing: \"Age\""))
    assert(ConvertValue.flatten(c, data + ("X" -> 1)) ==
      Left("Unknown key: \"X\""))
  }

  test("record.lua: person unflatten round-trip") {
    val c = compiled(personJson)
    val tuple = Vector("John", "Doe", 33L, 1L, "+7", "Street", "Engineer")
    val obj = ConvertValue.unflatten(c, tuple)
    assert(obj.isRight)
    assert(ConvertValue.flatten(c, obj.toOption.get) == Right(tuple))
  }

  // ---- record_version.lua F5 ----

  private def foo(fields: String*) =
    s"""{"name":"foo","type":"record","fields":[${fields.mkString(",")}]}"""
  private def f(n: String, d: Int) =
    s"""{"name":"$n","type":"int","default":$d}"""

  test("record_version.lua: reorder / widen / narrow") {
    val foo4 = foo(f("A", 1001), f("B", 1002), f("C", 1003), f("D", 1004))
    val fooRev = foo(f("D", 1004), f("C", 1003), f("B", 1002), f("A", 1001))
    val fooRed = foo(f("A", 1001), f("B", 1002))
    val data = Map("A" -> 1L, "B" -> 2L, "C" -> 3L, "D" -> 4L)
    assert(ConvertValue.flatten(compiled2(foo4, fooRev), data) ==
      Right(Vector(4L, 3L, 2L, 1L)))
    assert(ConvertValue.flatten(compiled2(fooRed, foo4),
      Map("A" -> 1L, "B" -> 2L)) == Right(Vector(1L, 2L, 1003L, 1004L)))
    assert(ConvertValue.flatten(compiled2(foo4, fooRed), data) ==
      Right(Vector(1L, 2L)))
    // narrowed-away fields still type-checked
    assert(ConvertValue.flatten(compiled2(foo4, fooRed),
      data.updated("C", "nope")) ==
      Left("C: Expecting INT, encountered STR"))
  }

  // ---- enum_versions.lua F6 ----

  test("enum_versions.lua: cross-version symbol mapping + errors") {
    def e(syms: String*) =
      s"""{"name":"r","type":"record","fields":[{"name":"v","type":
        {"type":"enum","name":"E","symbols":[${syms.map("\"" + _ + "\"")
          .mkString(",")}]}}]}"""
    val v1 = e("CAR", "TRUCK", "TRICYCLE")
    val v2 = e("TRUCK", "CAR", "SCOOTER")
    val c = compiled2(v1, v2)
    assert(ConvertValue.flatten(c, Map("v" -> "CAR")) == Right(Vector(1)))
    assert(ConvertValue.flatten(c, Map("v" -> "TRUCK")) == Right(Vector(0)))
    assert(ConvertValue.flatten(c, Map("v" -> "TRICYCLE")) ==
      Left("v: Bad value: \"TRICYCLE\" (schema versioning)"))
    // unflatten: index 2 (TRICYCLE) has no target symbol
    assert(ConvertValue.unflatten(c, Seq(2)) ==
      Left("1: Bad value: 2 (schema versioning)"))
    assert(ConvertValue.unflatten(c, Seq(0)) ==
      Right(Map("v" -> "CAR")))
  }

  // ---- record_hidden.lua F9 ----

  test("record_hidden.lua: hidden occupy slots, dropped from object") {
    val c = compiled("""{"name":"r","type":"record","fields":[
      {"name":"A","type":"int","hidden":true},
      {"name":"B","type":"int","hidden":true},
      {"name":"C","type":"int","hidden":true},
      {"name":"D","type":"int"}]}""")
    assert(ConvertValue.unflatten(c, Seq(100L, 200L, 300L, 400L)) ==
      Right(Map("D" -> 400L)))
  }

  // ---- recursive.lua F4 ----

  test("recursive.lua: flatten through union indirection") {
    val c = compiled("""{"name":"node","type":"record","fields":[
      {"name":"next","type":["null","node"]},
      {"name":"label","type":"string"}]}""")
    val data = Map("label" -> "L1",
      "next" -> Map("node" -> Map("label" -> "L2", "next" -> null)))
    assert(ConvertValue.flatten(c, data) ==
      Right(Vector(1, Vector(0, null, "L2"), "L1")))
    val back = ConvertValue.unflatten(c, Vector(1, Vector(0, null, "L2"), "L1"))
    assert(back == Right(Map(
      "next" -> Map("node" -> Map("next" -> null, "label" -> "L2")),
      "label" -> "L1")))
  }

  // ---- record.lua:349–400 xflatten ----

  test("record.lua: xflatten present fields in schema order") {
    val c = compiled(personJson)
    assert(ConvertValue.xflatten(c, Map("FirstName" -> "John")) ==
      Right(Vector(Vector("=", 1, "John"))))
    assert(ConvertValue.xflatten(c, Map("Age" -> 33L)) ==
      Right(Vector(Vector("=", 3, 33L))))
    assert(ConvertValue.xflatten(c,
      Map("LastName" -> "Doe", "FirstName" -> "John", "Age" -> 33L)) ==
      Right(Vector(Vector("=", 1, "John"), Vector("=", 2, "Doe"),
        Vector("=", 3, 33L))))
    assert(ConvertValue.xflatten(c, Map("Nope" -> 1L)) ==
      Left("Unknown key: \"Nope\""))
  }

  test("xflatten: union fields emit two ops (compiler.lua:1002–1013)") {
    val c = compiled(unionRec("""["null","int"]"""))
    assert(ConvertValue.xflatten(c, Map("u" -> Map("int" -> 42L))) ==
      Right(Vector(Vector("=", 1, 1), Vector("=", 2, 42L))))
    assert(ConvertValue.xflatten(c, Map("u" -> null)) ==
      Right(Vector(Vector("=", 1, 0), Vector("=", 2, null))))
  }

  // ---- service_fields.lua F8 ----

  test("service_fields.lua: prefix slots") {
    val c = FlattenOps.compile(
      Avro.create("""{"name":"s","type":"record","fields":[
        {"name":"a","type":"string"},{"name":"b","type":"int"}]}"""),
      Avro.create("""{"name":"s","type":"record","fields":[
        {"name":"a","type":"string"},{"name":"b","type":"int"}]}"""),
      downgrade = false,
      Seq(org.apache.spark.sql.types.BooleanType))
      .fold(e => sys.error(e), identity)
    assert(ConvertValue.flatten(c, Map("a" -> "Simple ", "b" -> 1234L),
      Seq(true)) == Right(Vector(true, "Simple ", 1234L)))
    assert(ConvertValue.unflatten(c, Seq(true, "Simple ", 1234L)) ==
      Right(Map("a" -> "Simple ", "b" -> 1234L)))
  }

  // ---- promotions F7 ----

  test("promotions: int→double flatten, reverse rejected at compile") {
    val w = """{"name":"r","type":"record","fields":[
      {"name":"a","type":"int"}]}"""
    val rD = """{"name":"r","type":"record","fields":[
      {"name":"a","type":"double"}]}"""
    assert(ConvertValue.flatten(compiled2(w, rD), Map("a" -> 7L)) ==
      Right(Vector(7.0)))
    assert(FlattenOps.compile(Avro.create(rD), Avro.create(w)).isLeft)
  }

  // ---- nested records inline (record.lua nested shapes) ----

  test("nested record inlines; nullable record is null-or-subarray") {
    val c = compiled("""{"name":"X","type":"record","fields":[
      {"name":"x1","type":"string"},
      {"name":"x2","type":{"type":"record","name":"Y","fields":[
        {"name":"y1","type":"string"},{"name":"y2","type":"long"}]}},
      {"name":"x3","type":{"type":"record*","name":"Z","fields":[
        {"name":"z1","type":"string"}]}}]}""")
    assert(ConvertValue.flatten(c, Map(
      "x1" -> "a", "x2" -> Map("y1" -> "b", "y2" -> 7L),
      "x3" -> Map("z1" -> "z"))) ==
      Right(Vector("a", "b", 7L, Vector("z"))))
    assert(ConvertValue.flatten(c, Map(
      "x1" -> "a", "x2" -> Map("y1" -> "b", "y2" -> 7L), "x3" -> null)) ==
      Right(Vector("a", "b", 7L, null)))
    // nested path in errors
    assert(ConvertValue.flatten(c, Map(
      "x1" -> "a", "x2" -> Map("y1" -> "b", "y2" -> "bad"),
      "x3" -> null)) == Left("x2/y2: Expecting LONG, encountered STR"))
  }

  // ---- record_vlo.lua: variable-length fields around defaults ----

  private val vlo1 = compiled("""{"type":"record","name":"vlo1","fields":[
    {"name":"A","type":"int","default":100},
    {"name":"B","type":"int","default":101},
    {"name":"VLO","type":{"type":"array","items":"int"}}]}""")

  private val vlo2 = compiled("""{"type":"record","name":"vlo2","fields":[
    {"name":"VLO","type":{"type":"array","items":"int"}},
    {"name":"A","type":"int","default":100},
    {"name":"B","type":"int","default":101}]}""")

  private val vlo3 = compiled("""{"type":"record","name":"vlo3","fields":[
    {"name":"VL1","type":{"type":"array","items":"int"}},
    {"name":"A","type":"int","default":100},
    {"name":"B","type":"int","default":101},
    {"name":"VL2","type":{"type":"array","items":"int"}}]}""")

  private val vlo4 = compiled("""{"type":"record","name":"vlo4","fields":[
    {"name":"A","type":"int","default":100},
    {"name":"VLO","type":{"name":"nested","type":"record","fields":[
      {"name":"_","type":{"type":"array","items":"int"}}]}},
    {"name":"B","type":"int","default":101}]}""")

  private def arr(xs: Long*): Vector[Any] = xs.toVector

  test("record_vlo.lua: trailing VLO with defaults before it") {
    assert(ConvertValue.flatten(vlo1, Map("VLO" -> arr(1, 2, 3, 4))) ==
      Right(Vector(100L, 101L, arr(1, 2, 3, 4))))
    assert(ConvertValue.flatten(vlo1,
      Map("A" -> 1L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(1L, 101L, arr(1, 2, 3))))
    assert(ConvertValue.flatten(vlo1,
      Map("B" -> 2L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(100L, 2L, arr(1, 2, 3))))
    assert(ConvertValue.flatten(vlo1,
      Map("A" -> 1L, "B" -> 2L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(1L, 2L, arr(1, 2, 3))))
  }

  test("record_vlo.lua: leading VLO with defaults after it") {
    assert(ConvertValue.flatten(vlo2, Map("VLO" -> arr(1, 2, 3, 4))) ==
      Right(Vector(arr(1, 2, 3, 4), 100L, 101L)))
    assert(ConvertValue.flatten(vlo2,
      Map("A" -> 1L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(arr(1, 2, 3), 1L, 101L)))
    assert(ConvertValue.flatten(vlo2,
      Map("B" -> 2L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(arr(1, 2, 3), 100L, 2L)))
    assert(ConvertValue.flatten(vlo2,
      Map("A" -> 1L, "B" -> 2L, "VLO" -> arr(1, 2, 3))) ==
      Right(Vector(arr(1, 2, 3), 1L, 2L)))
  }

  test("record_vlo.lua: VLOs on both sides of defaults") {
    assert(ConvertValue.flatten(vlo3,
      Map("VL1" -> arr(1, 2, 3), "VL2" -> arr(4, 5, 6))) ==
      Right(Vector(arr(1, 2, 3), 100L, 101L, arr(4, 5, 6))))
    assert(ConvertValue.flatten(vlo3,
      Map("A" -> 1L, "VL1" -> arr(1, 2, 3), "VL2" -> arr(4, 5, 6))) ==
      Right(Vector(arr(1, 2, 3), 1L, 101L, arr(4, 5, 6))))
    assert(ConvertValue.flatten(vlo3,
      Map("B" -> 2L, "VL1" -> arr(1, 2, 3), "VL2" -> arr(4, 5, 6))) ==
      Right(Vector(arr(1, 2, 3), 100L, 2L, arr(4, 5, 6))))
    assert(ConvertValue.flatten(vlo3,
      Map("A" -> 1L, "B" -> 2L, "VL1" -> arr(1, 2, 3),
        "VL2" -> arr(4, 5, 6))) ==
      Right(Vector(arr(1, 2, 3), 1L, 2L, arr(4, 5, 6))))
  }

  test("record_vlo.lua: VLO inside a nested record between defaults") {
    assert(ConvertValue.flatten(vlo4,
      Map("VLO" -> Map("_" -> arr(1, 2, 3, 4)))) ==
      Right(Vector(100L, arr(1, 2, 3, 4), 101L)))
    assert(ConvertValue.flatten(vlo4,
      Map("B" -> 99L, "VLO" -> Map("_" -> arr(1, 2, 3, 4)))) ==
      Right(Vector(100L, arr(1, 2, 3, 4), 99L)))
    assert(ConvertValue.flatten(vlo4,
      Map("A" -> 1L, "VLO" -> Map("_" -> arr(1, 2, 3, 4)))) ==
      Right(Vector(1L, arr(1, 2, 3, 4), 101L)))
  }
}
