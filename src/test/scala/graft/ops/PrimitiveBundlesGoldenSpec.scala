package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-exact goldens for the eight DDT bundles not yet carried by a
  * dedicated spec: test/ddt_suite/{boolean,long,double,float,string,null,
  * enum_large,incompatible_array}.lua. Together with the promo/record/
  * array-map/validate/incompatible specs this closes the bundle list —
  * every ddt_suite file is now cited by a golden test.
  *
  * Token-family notes carried from the bundles:
  *  - the Lua harness's `!` marker selects single-precision msgpack
  *    floats; in JVM object form that is a Scala `Float`, and FLOAT/DOUBLE
  *    schemas accept either precision (double.lua:1–9, float.lua:1–9)
  *    while integer inputs auto-widen (runtime.lua long→flt/dbl repair);
  *  - every other type mismatch is a hard `Expecting X, encountered Y`
  *    error in the writer's token family;
  *  - nullable `T*` roots pass null through both directions
  *    (boolean.lua:60–78 et al.).
  */
class PrimitiveBundlesGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private val hello = "Hello, world!"
  private val bin = Array[Byte](0xDE.toByte, 0xAD.toByte, 0xBE.toByte,
    0xEF.toByte)

  /** The non-matching inputs each primitive bundle probes, with the token
    * name the error message must carry (boolean.lua:11–58 shape, repeated
    * verbatim in long/double/float/string/null.lua).
    */
  private val tokens: Seq[(String, Any)] = Seq(
    "NIL" -> null, "FALSE" -> false, "TRUE" -> true, "LONG" -> 42L,
    "FLOAT" -> 42.0f, "DOUBLE" -> 42.0, "STR" -> hello, "BIN" -> bin,
    "ARRAY" -> Seq(42L), "MAP" -> Map("key" -> 42L))

  private def rejects(schema: String, expecting: String,
      accept: Set[String]): Unit =
    for ((tok, v) <- tokens if !accept.contains(tok))
      assert(ConvertValue.flatten(compiled(schema), v) ==
        Left(s"Expecting $expecting, encountered $tok"), s"input token $tok")

  // ---- boolean.lua ----

  test("boolean.lua: flatten accepts exactly BOOL; T* passes null") {
    val c = compiled("\"boolean\"")
    assert(ConvertValue.flatten(c, false) == Right(Vector(false)))
    assert(ConvertValue.flatten(c, true) == Right(Vector(true)))
    rejects("\"boolean\"", "BOOL", Set("FALSE", "TRUE"))
    val n = compiled("\"boolean*\"")
    assert(ConvertValue.flatten(n, true) == Right(Vector(true)))
    assert(ConvertValue.flatten(n, null) == Right(Vector(null)))
    assert(ConvertValue.unflatten(n, Seq(false)) == Right(false))
    assert(ConvertValue.unflatten(n, Seq(null)) == Right(null))
  }

  // ---- long.lua ----

  test("long.lua: flatten accepts exactly LONG; T* passes null") {
    val c = compiled("\"long\"")
    assert(ConvertValue.flatten(c, 42L) == Right(Vector(42L)))
    rejects("\"long\"", "LONG", Set("LONG"))
    val n = compiled("\"long*\"")
    assert(ConvertValue.flatten(n, 42L) == Right(Vector(42L)))
    assert(ConvertValue.flatten(n, null) == Right(Vector(null)))
    assert(ConvertValue.unflatten(n, Seq(42L)) == Right(42L))
    assert(ConvertValue.unflatten(n, Seq(null)) == Right(null))
  }

  // ---- double.lua ----

  test("double.lua: both precisions and integers widen; others rejected") {
    val c = compiled("\"double\"")
    assert(ConvertValue.flatten(c, 99.25) == Right(Vector(99.25)))
    // '! 99.25' — single-precision input
    assert(ConvertValue.flatten(c, 99.25f) == Right(Vector(99.25)))
    // auto long->double conversion (double.lua:12–21)
    assert(ConvertValue.flatten(c, 42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(c, -9000000L) == Right(Vector(-9000000.0)))
    rejects("\"double\"", "DOUBLE", Set("LONG", "FLOAT", "DOUBLE"))
    val n = compiled("\"double*\"")
    assert(ConvertValue.flatten(n, 42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(n, null) == Right(Vector(null)))
    assert(ConvertValue.unflatten(n, Seq(42L)) == Right(42.0))
    assert(ConvertValue.unflatten(n, Seq(null)) == Right(null))
  }

  // ---- float.lua ----

  test("float.lua: both precisions and integers widen; others rejected") {
    val c = compiled("\"float\"")
    // float.lua:1–9 — '! 99.25' and '99.25' both land on single 99.25;
    // 99.25 is exactly representable so the JVM Double carries it
    assert(ConvertValue.flatten(c, 99.25f) == Right(Vector(99.25)))
    assert(ConvertValue.flatten(c, 99.25) == Right(Vector(99.25)))
    assert(ConvertValue.flatten(c, 42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(c, -9000000L) == Right(Vector(-9000000.0)))
    rejects("\"float\"", "FLOAT", Set("LONG", "FLOAT", "DOUBLE"))
    val n = compiled("\"float*\"")
    assert(ConvertValue.flatten(n, 42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(n, null) == Right(Vector(null)))
    assert(ConvertValue.unflatten(n, Seq(42L)) == Right(42.0))
    assert(ConvertValue.unflatten(n, Seq(null)) == Right(null))
  }

  // ---- string.lua ----

  test("string.lua: STR only (incl. empty and long); T* passes null") {
    val c = compiled("\"string\"")
    assert(ConvertValue.flatten(c, hello) == Right(Vector(hello)))
    assert(ConvertValue.flatten(c, "") == Right(Vector("")))
    val long = "123456789.123456789.123456789.1234567890"
    assert(ConvertValue.flatten(c, long) == Right(Vector(long)))
    rejects("\"string\"", "STR", Set("STR"))
    val n = compiled("\"string*\"")
    assert(ConvertValue.flatten(n, "kek") == Right(Vector("kek")))
    assert(ConvertValue.flatten(n, null) == Right(Vector(null)))
    assert(ConvertValue.unflatten(n, Seq("kek")) == Right("kek"))
    assert(ConvertValue.unflatten(n, Seq(null)) == Right(null))
  }

  // ---- null.lua ----

  test("null.lua: NIL only; missing nullable fixed fills null") {
    val c = compiled("\"null\"")
    assert(ConvertValue.flatten(c, null) == Right(Vector(null)))
    rejects("\"null\"", "NIL", Set("NIL"))
    // null.lua:61–70 — record with a nullable fixed: absent f1 → null slot
    val rec = compiled("""{"type":"record","name":"X","fields":[
      {"name":"f1","type":{"type":"fixed*","name":"ff","size":4}},
      {"name":"f2","type":"int"}]}""")
    assert(ConvertValue.flatten(rec, Map("f2" -> 1L)) ==
      Right(Vector(null, 1L)))
  }

  // ---- enum_large.lua ----

  test("enum_large.lua: all 100 symbols round-trip S2I/I2S") {
    val symbols = Seq("january", "february", "march", "april", "may",
      "june", "july", "august", "september", "october", "november",
      "december") ++ (13 to 100).map(i => s"_$i")
    val json = symbols.mkString(
      """{"name":"large","type":"enum","symbols":["""", "\", \"", "\"]}")
    val c = compiled(json)
    for ((s, i) <- symbols.zipWithIndex) {
      assert(ConvertValue.flatten(c, s) == Right(Vector(i)), s)
      assert(ConvertValue.unflatten(c, Seq(i)) == Right(s), i)
    }
  }

  // ---- incompatible_array.lua ----

  test("incompatible_array.lua: item-type mismatch carries <array> path") {
    assert(Compat.resolve(
      Avro.create("""{"type":"array","items":"int"}"""),
      Avro.create("""{"type":"array","items":"string"}""")) ==
      Left("<array>: Types incompatible: int and string"))
  }
}
