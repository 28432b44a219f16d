package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-exact goldens for the six promotion/union DDT bundles:
  * test/ddt_suite/{bytes_promo,string_promo,float_promo,long_promo,
  * record_union,incompatible_map}.lua. These encode the token-family and
  * precision semantics where an ANSI-mode Catalyst engine is most likely
  * to silently diverge, so every value and error string below is copied
  * verbatim from the bundle (the Lua harness's `!` marker selects
  * single-precision msgpack floats; here that is a Scala `Float`).
  */
class PromoBundlesGoldenSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private def compiled2(w: String, r: String): Compiled =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(e => sys.error(e), identity)

  private def compileErr(w: String, r: String): String =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(identity, _ => "NO ERROR")

  // "Hello, world!" is hex 48656c6c6f2c20776f726c6421 in both bundles
  private val hello = "Hello, world!"

  // ---- bytes_promo.lua ----

  test("bytes_promo.lua: bytes->string converts; STR/NIL inputs rejected") {
    val c = compiled2("\"bytes\"", "\"string\"")
    assert(ConvertValue.flatten(c, hello.getBytes(utf8)) ==
      Right(Vector(hello)))
    assert(ConvertValue.flatten(c, hello) ==
      Left("Expecting BIN, encountered STR"))
    assert(ConvertValue.flatten(c, null) ==
      Left("Expecting BIN, encountered NIL"))
  }

  // ---- string_promo.lua ----

  test("string_promo.lua: string->bytes converts; BIN/NIL inputs rejected") {
    val c = compiled2("\"string\"", "\"bytes\"")
    val out = ConvertValue.flatten(c, hello)
    assert(out.isRight)
    assert(out.toOption.get.head.asInstanceOf[Array[Byte]]
      .sameElements(hello.getBytes(utf8)))
    assert(ConvertValue.flatten(c, hello.getBytes(utf8)) ==
      Left("Expecting STR, encountered BIN"))
    assert(ConvertValue.flatten(c, null) ==
      Left("Expecting STR, encountered NIL"))
  }

  // ---- float_promo.lua ----

  test("float_promo.lua: float->double values (double, single, int inputs)") {
    val c = compiled2("\"float\"", "\"double\"")
    assert(ConvertValue.flatten(c, 42.25) == Right(Vector(42.25)))
    // '! 42.25' — single-precision input
    assert(ConvertValue.flatten(c, 42.25f) == Right(Vector(42.25)))
    // '42' — integer input widens to 42.0
    assert(ConvertValue.flatten(c, 42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(c, null) ==
      Left("Expecting FLOAT, encountered NIL"))
  }

  test("float_promo.lua: double->float narrowing rejected at compile") {
    assert(compileErr("\"double\"", "\"float\"") ==
      "Types incompatible: double and float")
  }

  // ---- long_promo.lua ----

  test("long_promo.lua: long->float and long->double widen the value") {
    assert(ConvertValue.flatten(compiled2("\"long\"", "\"float\""), 9999L) ==
      Right(Vector(9999.0)))
    assert(ConvertValue.flatten(compiled2("\"long\"", "\"double\""), 9999L) ==
      Right(Vector(9999.0)))
  }

  test("long_promo.lua: float/double->long narrowing rejected at compile") {
    assert(compileErr("\"float\"", "\"long\"") ==
      "Types incompatible: float and long")
    assert(compileErr("\"double\"", "\"long\"") ==
      "Types incompatible: double and long")
  }

  test("long_promo.lua: promo guards still reject FLOAT/DOUBLE/NIL inputs") {
    for (r <- Seq("\"float\"", "\"double\"")) {
      val c = compiled2("\"long\"", r)
      // '!9999.1' — single-precision input
      assert(ConvertValue.flatten(c, 9999.1f) ==
        Left("Expecting LONG, encountered FLOAT"), r)
      assert(ConvertValue.flatten(c, 9999.1) ==
        Left("Expecting LONG, encountered DOUBLE"), r)
      assert(ConvertValue.flatten(c, null) ==
        Left("Expecting LONG, encountered NIL"), r)
    }
  }

  // ---- incompatible_map.lua ----

  test("incompatible_map.lua: value-type mismatch carries the <map> path") {
    assert(Compat.resolve(
      Avro.create("""{"type":"map","values":"int"}"""),
      Avro.create("""{"type":"map","values":"string"}""")) ==
      Left("<map>: Types incompatible: int and string"))
  }

  // ---- record_union.lua (part 1: union directly in a field) ----

  private val fooUnion = compiled("""{
    "name": "foo", "type": "record", "fields": [
      {"name": "A", "type": "string"},
      {"name": "B", "type": ["null", "string"]},
      {"name": "C", "type": "int"}]}""")

  test("record_union.lua: flatten splices [tag, value] into the tuple") {
    assert(ConvertValue.flatten(fooUnion,
      Map("A" -> hello, "B" -> null, "C" -> 42L)) ==
      Right(Vector(hello, 0, null, 42L)))
    assert(ConvertValue.flatten(fooUnion,
      Map("A" -> hello, "B" -> Map("string" -> "OLOLO"), "C" -> 42L)) ==
      Right(Vector(hello, 1, "OLOLO", 42L)))
  }

  test("record_union.lua: unflatten reassembles the branch wrapper") {
    assert(ConvertValue.unflatten(fooUnion, Seq(hello, 0, null, 42L)) ==
      Right(Map("A" -> hello, "B" -> null, "C" -> 42L)))
    assert(ConvertValue.unflatten(fooUnion, Seq(hello, 1, "OLOLO", 42L)) ==
      Right(Map("A" -> hello, "B" -> Map("string" -> "OLOLO"),
        "C" -> 42L)))
  }

  test("record_union.lua: xflatten emits two ops for the union field") {
    assert(ConvertValue.xflatten(fooUnion, Map("A" -> hello)) ==
      Right(Vector(Vector("=", 1, hello))))
    assert(ConvertValue.xflatten(fooUnion, Map("B" -> null)) ==
      Right(Vector(Vector("=", 2, 0), Vector("=", 3, null))))
    assert(ConvertValue.xflatten(fooUnion,
      Map("B" -> Map("string" -> "OLOLO"))) ==
      Right(Vector(Vector("=", 2, 1), Vector("=", 3, "OLOLO"))))
    assert(ConvertValue.xflatten(fooUnion, Map("C" -> 42L)) ==
      Right(Vector(Vector("=", 4, 42L))))
  }

  // ---- record_union.lua (part 2: union inside a nested record — the
  // flat layout and op positions are identical) ----

  private val fooNested = compiled("""{
    "name": "foo", "type": "record", "fields": [
      {"name": "A", "type": "string"},
      {"name": "B", "type": {
        "name": "nested", "type": "record", "fields": [
          {"name": "_", "type": ["null", "string"]}]}},
      {"name": "C", "type": "int"}]}""")

  test("record_union.lua: nested-record union flattens to the same tuple") {
    assert(ConvertValue.flatten(fooNested,
      Map("A" -> hello, "B" -> Map("_" -> null), "C" -> 42L)) ==
      Right(Vector(hello, 0, null, 42L)))
    assert(ConvertValue.flatten(fooNested,
      Map("A" -> hello, "B" -> Map("_" -> Map("string" -> "OLOLO")),
        "C" -> 42L)) ==
      Right(Vector(hello, 1, "OLOLO", 42L)))
  }

  test("record_union.lua: nested-record union unflattens back") {
    assert(ConvertValue.unflatten(fooNested, Seq(hello, 0, null, 42L)) ==
      Right(Map("A" -> hello, "B" -> Map("_" -> null), "C" -> 42L)))
    assert(ConvertValue.unflatten(fooNested, Seq(hello, 1, "OLOLO", 42L)) ==
      Right(Map("A" -> hello, "B" -> Map("_" -> Map("string" -> "OLOLO")),
        "C" -> 42L)))
  }

  test("record_union.lua: xflatten recurses into the nested record") {
    assert(ConvertValue.xflatten(fooNested, Map("A" -> hello)) ==
      Right(Vector(Vector("=", 1, hello))))
    assert(ConvertValue.xflatten(fooNested, Map("B" -> Map("_" -> null))) ==
      Right(Vector(Vector("=", 2, 0), Vector("=", 3, null))))
    assert(ConvertValue.xflatten(fooNested,
      Map("B" -> Map("_" -> Map("string" -> "OLOLO")))) ==
      Right(Vector(Vector("=", 2, 1), Vector("=", 3, "OLOLO"))))
    assert(ConvertValue.xflatten(fooNested, Map("C" -> 42L)) ==
      Right(Vector(Vector("=", 4, 42L))))
  }
}
