package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Root-enum golden cases from test/ddt_suite/enum_versions.lua:
  * cross-version symbol→index mapping at the schema root, with the
  * `(schema versioning)` suffix only when the symbol exists on the writer
  * side but was dropped by the reader.
  */
class EnumVersionsRootGoldenSpec extends AnyFunSuite {

  private val v1 = """{"name":"vehicle","type":"enum","symbols":
    ["CAR","BUS","TRICYCLE","TRUCK"]}"""
  // TRICYCLE removed, TRUCK changes ID, SCOOTER added
  private val v2 = """{"name":"vehicle","type":"enum","symbols":
    ["CAR","BUS","TRUCK","SCOOTER"]}"""

  private def compiled2(w: String, r: String): Compiled =
    FlattenOps.compile(Avro.create(w), Avro.create(r))
      .fold(e => sys.error(e), identity)

  test("flatten maps symbols to READER ids in both directions") {
    val c12 = compiled2(v1, v2)
    val c21 = compiled2(v2, v1)
    assert(ConvertValue.flatten(c12, "CAR") == Right(Vector(0)))
    assert(ConvertValue.flatten(c21, "CAR") == Right(Vector(0)))
    assert(ConvertValue.flatten(c12, "TRUCK") == Right(Vector(2)))
    assert(ConvertValue.flatten(c21, "TRUCK") == Right(Vector(3)))
  }

  test("unflatten maps writer ids back to symbols") {
    val c12 = compiled2(v1, v2)
    val c21 = compiled2(v2, v1)
    assert(ConvertValue.unflatten(c12, Vector(0)) == Right("CAR"))
    assert(ConvertValue.unflatten(c12, Vector(3)) == Right("TRUCK"))
    assert(ConvertValue.unflatten(c21, Vector(2)) == Right("TRUCK"))
  }

  test("dropped symbols: versioning suffix only when writer-side") {
    val c12 = compiled2(v1, v2)
    val c21 = compiled2(v2, v1)
    assert(ConvertValue.flatten(c12, "TRICYCLE") ==
      Left("Bad value: \"TRICYCLE\" (schema versioning)"))
    assert(ConvertValue.flatten(c21, "TRICYCLE") ==
      Left("Bad value: \"TRICYCLE\""))
    assert(ConvertValue.flatten(c12, "SCOOTER") ==
      Left("Bad value: \"SCOOTER\""))
    assert(ConvertValue.flatten(c21, "SCOOTER") ==
      Left("Bad value: \"SCOOTER\" (schema versioning)"))
    assert(ConvertValue.unflatten(c12, Vector(2)) ==
      Left("1: Bad value: 2 (schema versioning)"))
    assert(ConvertValue.unflatten(c21, Vector(3)) ==
      Left("1: Bad value: 3 (schema versioning)"))
  }
}
