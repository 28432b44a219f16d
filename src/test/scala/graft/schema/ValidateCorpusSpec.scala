package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Cases ported from the reference's validate corpus
  * (reference: test/ddt_suite/validate.lua, 636 lines — the `validate`
  * error family, distinct from the flatten runtime family).
  */
class ValidateCorpusSpec extends AnyFunSuite {

  private def v(schema: String, data: Any): Either[String, Any] =
    ValidateValue.validate(Avro.create(schema), data)

  test("primitives: type mismatches (validate.lua:12–277)") {
    assert(v("\"null\"", 42L) == Left("Not a null: 42"))
    assert(v("\"null\"", null) == Right(null))
    assert(v("\"boolean\"", 100500L) == Left("Not a boolean: 100500"))
    assert(v("\"boolean\"", true) == Right(true))
    assert(v("\"int\"", 42.1) == Left("Not a int: 42.1"))
    assert(v("\"int\"", "Hello!") == Left("Not a int: Hello!"))
    assert(v("\"int\"", 2147483648L) == Left("Not a int: 2147483648"))
    assert(v("\"int\"", -2147483649L) == Left("Not a int: -2147483649"))
    assert(v("\"int\"", 2147483647L) == Right(2147483647L))
    assert(v("\"long\"", 42.1) == Left("Not a long: 42.1"))
    assert(v("\"long\"", "Hello!") == Left("Not a long: Hello!"))
    assert(v("\"long\"", Long.MaxValue) == Right(Long.MaxValue))
    assert(v("\"float\"", "Hello!") == Left("Not a float: Hello!"))
    assert(v("\"float\"", "0") == Left("Not a float: 0"))
    assert(v("\"float\"", 42L) == Right(42.0))
    assert(v("\"float\"", 42.1) == Right(42.1))
    assert(v("\"double\"", "Hello!") == Left("Not a double: Hello!"))
    assert(v("\"string\"", 42L) == Left("Not a string: 42"))
    assert(v("\"bytes\"", 42L) == Left("Not a bytes: 42"))
  }

  test("array: element errors with 1-based paths (validate.lua:299–311)") {
    val arr = """{"type":"array","items":"int"}"""
    assert(v(arr, 42L) == Left("Not a array: 42"))
    assert(v(arr, Seq(1L, 2L, 3L, 4L, 5L, "XXX")) ==
      Left("6: Not a int: XXX"))
    assert(v(arr, Seq(1L, 2L)) == Right(Vector(1L, 2L)))
  }

  test("map: value errors with key paths (validate.lua:333–339)") {
    val m = """{"type":"map","values":"int"}"""
    assert(v(m, 42L) == Left("Not a map: 42"))
    assert(v(m, Map("F" -> "XXX")) == Left("F: Not a int: XXX"))
    assert(v(m, Map("a" -> 1L)).isRight)
  }

  test("fixed: name in message (validate.lua:401–407)") {
    val fx = """{"type":"fixed","name":"fixed16","size":16}"""
    assert(v(fx, 42L) == Left("Not a fixed16: 42"))
    assert(v(fx, "Hello, world!") == Left("Not a fixed16: Hello, world!"))
    assert(v(fx, "0123456789abcdef").isRight)
  }

  test("enum: name in message (validate.lua:435–441)") {
    val e = """{"type":"enum","name":"foo","symbols":["A","B"]}"""
    assert(v(e, 42L) == Left("Not a foo: 42"))
    assert(v(e, "X") == Left("Not a foo: X"))
    assert(v(e, "A") == Right("A"))
  }

  test("record: unknown/missing fields (validate.lua:471–608)") {
    val foo = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"string"},{"name":"Y","type":"boolean"}]}"""
    assert(v(foo, Map("X" -> "s", "Y" -> true, "Z" -> 1L)) ==
      Left("Z: Unknown field"))
    assert(v(foo, Map("X" -> 42L, "Y" -> true)) ==
      Left("X: Not a string: 42"))
    assert(v(foo, Map("X" -> "s", "Y" -> "Hello, world!")) ==
      Left("Y: Not a boolean: Hello, world!"))
    assert(v(foo, Map("Y" -> true)) == Left("Field X missing"))
    assert(v(foo, 42L) == Left("Not a foo: 42"))
  }

  test("nested paths compose with '/'") {
    val s = """{"name":"Frob","type":"record","fields":[
      {"name":"Stats","type":{"name":"S","type":"record","fields":[
        {"name":"Luck","type":"long"}]}}]}"""
    assert(v(s, Map("Stats" -> Map("Luck" -> "nope"))) ==
      Left("Stats/Luck: Not a long: nope"))
  }

  test("gh-113: null through a union with null branch") {
    assert(v("""["int","null"]""", null) == Right(null))
    assert(v("""["int","string"]""", null) ==
      Left("Unexpected type in union: null"))
  }

  test("union: single-key form and error family (validate.lua:342–386)") {
    val u = """["null","string"]"""
    assert(v(u, null).isRight)
    assert(v("""["string"]""", null) ==
      Left("Unexpected type in union: null"))
    assert(v(u, Map("string" -> "Hello, world!")).isRight)
    assert(v(u, 42L) == Left("Not a union: 42"))
    assert(v(u, Map("string" -> 42L)) ==
      Left("string: Not a string: 42"))
    assert(v(u, Map("XXX" -> 42L)) ==
      Left("XXX: Unexpected key in union"))
    assert(v(u, Map("string" -> "", "XXX" -> 42L)) ==
      Left("XXX: Unexpected key in union"))
  }

  test("gh-88: false in a record field is a present value") {
    val s = """{"type":"record","name":"X","fields":[
      {"name":"f1","type":"boolean"}]}"""
    assert(v(s, Map("f1" -> false)).isRight)
  }

  test("record: missing field with a default passes (validate.lua:495)") {
    val withDefault = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"string"},
      {"name":"Y","type":"boolean","default":false}]}"""
    assert(v(withDefault, Map("X" -> "")).isRight)
    val noDefault = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"string"},{"name":"Y","type":"boolean"}]}"""
    assert(v(noDefault, Map("X" -> "")) == Left("Field Y missing"))
  }

  test("gh-64: absent union-with-null field treated as null") {
    val s = """{"name":"foo","type":"record","fields":[
      {"name":"A","type":"string"},
      {"name":"B","type":["null","string"]},
      {"name":"C","type":"int"}]}"""
    assert(v(s, Map("A" -> "Hello, world!", "C" -> 42L)).isRight)
  }

  test("nullability: `*` types accept null and value (validate.lua:524)") {
    assert(v("\"string*\"", null).isRight)
    assert(v("\"string*\"", "HELLO").isRight)
    val recStar = """{"name":"foo","type":"record*","fields":[
      {"name":"X","type":"string"}]}"""
    assert(v(recStar, Map("X" -> "HELLO")).isRight)
    assert(v(recStar, null).isRight)
    // gh-35: absent nullable field means NULL
    val gh35 = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"string"},{"name":"Y","type":"string*"}]}"""
    assert(v(gh35, Map("X" -> "HELLO")).isRight)
    val f1 = """{"type":"record","name":"X","fields":[
      {"name":"f1","type":"float*"}]}"""
    assert(v(f1, Map("f1" -> 3.1415)).isRight)
  }

  test("any: accepts everything; still subject to presence (validate.lua:571)") {
    assert(v("\"any\"", null).isRight)
    assert(v("\"any\"", "string").isRight)
    assert(v("\"any\"", Seq("1", 1L, null, Map("1" -> 2L))).isRight)
    val recAny = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"any"}]}"""
    assert(v(recAny, Map("X" -> 123L)).isRight)
    assert(v(recAny, Map.empty[String, Any]) == Left("Field X missing"))
    val recAnyStar = """{"name":"foo","type":"record","fields":[
      {"name":"X","type":"any*"}]}"""
    assert(v(recAnyStar, Map.empty[String, Any]).isRight)
  }
}
