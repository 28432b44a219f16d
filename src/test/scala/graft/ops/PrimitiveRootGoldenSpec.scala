package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Root-primitive golden matrix from the reference's int/long/float/
  * double/string/bytes/boolean/null + *_promo DDT bundles: flatten wraps
  * the value in one slot, type guards use the runtime token family, int
  * range overflow has its own message, promotions convert.
  */
class PrimitiveRootGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private def compiled2(w: String, r: String): Compiled =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(e => sys.error(e), identity)

  test("int.lua: values and range") {
    val c = compiled("\"int\"")
    assert(ConvertValue.flatten(c, 42L) == Right(Vector(42L)))
    assert(ConvertValue.flatten(c, 2147483647L) ==
      Right(Vector(2147483647L)))
    assert(ConvertValue.flatten(c, -2147483648L) ==
      Right(Vector(-2147483648L)))
    assert(ConvertValue.flatten(c, 2147483648L) ==
      Left("Value exceeds INT range: 2147483648LL"))
    assert(ConvertValue.flatten(c, -2147483649L) ==
      Left("Value exceeds INT range: -2147483649LL"))
  }

  test("primitive type-error token matrix at the root") {
    val cases = Seq(
      ("\"int\"", "INT"), ("\"long\"", "LONG"), ("\"string\"", "STR"),
      ("\"boolean\"", "BOOL"))
    for ((schema, tok) <- cases) {
      val c = compiled(schema)
      assert(ConvertValue.flatten(c, null) ==
        Left(s"Expecting $tok, encountered NIL"), schema)
      if (tok != "BOOL")
        assert(ConvertValue.flatten(c, true) ==
          Left(s"Expecting $tok, encountered TRUE"), schema)
      if (tok != "STR")
        assert(ConvertValue.flatten(c, "Hello!") ==
          Left(s"Expecting $tok, encountered STR"), schema)
      if (tok == "INT" || tok == "LONG")
        assert(ConvertValue.flatten(c, 42.0) ==
          Left(s"Expecting $tok, encountered DOUBLE"), schema)
    }
    val cn = compiled("\"null\"")
    assert(ConvertValue.flatten(cn, null) == Right(Vector(null)))
    assert(ConvertValue.flatten(cn, 42L) ==
      Left("Expecting NIL, encountered LONG"))
  }

  test("fixed.lua: root fixed values and errors") {
    val c4 = compiled("""{"type":"fixed","size":4,"name":"fixed4"}""")
    val ok = ConvertValue.flatten(c4, Array[Byte](1, 2, 3, 4))
    assert(ok.isRight)
    assert(ok.toOption.get.head.asInstanceOf[Array[Byte]]
      .sameElements(Array[Byte](1, 2, 3, 4)))
    assert(ConvertValue.flatten(c4, null) ==
      Left("Expecting BIN, encountered NIL"))
    assert(ConvertValue.flatten(c4, true) ==
      Left("Expecting BIN, encountered TRUE"))
    assert(ConvertValue.flatten(c4, 42L) ==
      Left("Expecting BIN, encountered LONG"))
    assert(ConvertValue.flatten(c4, Array[Byte](1, 2)) ==
      Left("Expecting BIN of length 4. Encountered BIN of length 2."))
  }

  test("promotions at the root convert the value") {
    assert(ConvertValue.flatten(compiled2("\"int\"", "\"long\""), 42L) ==
      Right(Vector(42L)))
    assert(ConvertValue.flatten(compiled2("\"int\"", "\"double\""),
      2147483647L) == Right(Vector(2147483647.0)))
    assert(ConvertValue.flatten(compiled2("\"long\"", "\"double\""),
      42L) == Right(Vector(42.0)))
    assert(ConvertValue.flatten(compiled2("\"float\"", "\"double\""),
      1.5) == Right(Vector(1.5)))
    assert(ConvertValue.flatten(compiled2("\"string\"", "\"bytes\""),
      "hi").isRight)
    // reader-side narrowing rejected at compile time
    assert(FlattenOps.compile(Avro.create("\"long\""),
      Avro.create("\"int\"")) == Left("Types incompatible: long and int"))
  }

  test("int promo guards still reject bad inputs (int_promo.lua tail)") {
    for (r <- Seq("\"long\"", "\"float\"", "\"double\"")) {
      val c = compiled2("\"int\"", r)
      assert(ConvertValue.flatten(c, 9999.1) ==
        Left("Expecting INT, encountered DOUBLE"), r)
      assert(ConvertValue.flatten(c, null) ==
        Left("Expecting INT, encountered NIL"), r)
      assert(ConvertValue.flatten(c, 2147483648L) ==
        Left("Value exceeds INT range: 2147483648LL"), r)
      assert(ConvertValue.flatten(c, -2147483649L) ==
        Left("Value exceeds INT range: -2147483649LL"), r)
    }
  }
}
