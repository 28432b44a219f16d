package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from the reference's record_array.lua, record_nested.lua,
  * bug1.lua and namespace.lua DDT bundles.
  */
class RecordBundlesGoldenSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  private def createErr(json: String): String =
    (try { Avro.create(json); "NO ERROR" }
    catch { case e: AvroSchemaError => e.fullMessage })

  // ---- record_array.lua: records inside arrays flatten to subarrays ----

  private val recordArray = compiled("""{"type":"array","items":{
    "name":"foo","type":"record","fields":[
      {"name":"A","type":"int","default":1},
      {"name":"B","type":"int","default":2},
      {"name":"C","type":"int","default":3}]}}""")

  test("record_array.lua: per-element default fill, flat subarrays") {
    assert(ConvertValue.flatten(recordArray, Vector.empty) ==
      Right(Vector(Vector.empty)))
    assert(ConvertValue.flatten(recordArray, Vector(
      Map.empty[String, Any], Map("A" -> 100L), Map("B" -> 200L),
      Map("C" -> 300L))) ==
      Right(Vector(Vector(
        Vector(1L, 2L, 3L), Vector(100L, 2L, 3L),
        Vector(1L, 200L, 3L), Vector(1L, 2L, 300L)))))
    assert(ConvertValue.unflatten(recordArray, Vector(Vector.empty)) ==
      Right(Vector.empty))
    val back = ConvertValue.unflatten(recordArray,
      Vector(Vector(Vector(1L, 2L, 3L), Vector(100L, 2L, 3L))))
    assert(back == Right(Vector(
      Map("A" -> 1L, "B" -> 2L, "C" -> 3L),
      Map("A" -> 100L, "B" -> 2L, "C" -> 3L))))
  }

  test("record_array.lua: VLO field inside the element record") {
    val c = compiled("""{"type":"array","items":{
      "name":"foo","type":"record","fields":[
        {"name":"A","type":"int","default":1},
        {"name":"B","type":"int","default":2},
        {"name":"C","type":{"type":"array","items":"int"}}]}}""")
    assert(ConvertValue.flatten(c, Vector(
      Map("C" -> Vector.empty),
      Map("A" -> 100L, "C" -> Vector(1L, 2L, 3L, 4L)),
      Map("B" -> 200L, "C" -> Vector(5L, 6L, 7L, 8L)))) ==
      Right(Vector(Vector(
        Vector(1L, 2L, Vector.empty),
        Vector(100L, 2L, Vector(1L, 2L, 3L, 4L)),
        Vector(1L, 200L, Vector(5L, 6L, 7L, 8L))))))
  }

  // ---- record_nested.lua: deep inline flattening ----

  test("record_nested.lua: nested records inline; arrays of records nest") {
    val c = compiled("""{"type":"record","name":"user","fields":[
      {"name":"uid","type":"long"},
      {"name":"p1","type":"long"},
      {"name":"p2","type":"long"},
      {"name":"nested","type":{"type":"record","name":"nested","fields":[
        {"name":"x","type":"long"},{"name":"y","type":"long"},
        {"name":"points","type":{"type":"array","items":{
          "name":"point","type":"record","fields":[
            {"name":"x","type":"long"},{"name":"y","type":"long"}]}}}]}}]}""")
    val in = Map(
      "p2" -> 79031234569L, "p1" -> 79031234568L, "uid" -> 79031234567L,
      "nested" -> Map("y" -> 2L, "x" -> 1L, "points" -> Vector(
        Map("y" -> 20L, "x" -> 10L), Map("y" -> 22L, "x" -> 12L))))
    val flat = ConvertValue.flatten(c, in)
    assert(flat == Right(Vector(79031234567L, 79031234568L, 79031234569L,
      1L, 2L, Vector(Vector(10L, 20L), Vector(12L, 22L)))))
    val back = ConvertValue.unflatten(c, flat.toOption.get)
    assert(back == Right(Map(
      "uid" -> 79031234567L, "p1" -> 79031234568L, "p2" -> 79031234569L,
      "nested" -> Map("x" -> 1L, "y" -> 2L, "points" -> Vector(
        Map("x" -> 10L, "y" -> 20L), Map("x" -> 12L, "y" -> 22L))))))
  }

  // ---- bug1.lua: boolean false default fills ----

  test("bug1.lua: false default is a real value, not absence") {
    val c = compiled("""{"name":"subscriber_contract_info","type":"record",
      "fields":[
        {"name":"msisdn","type":"string"},
        {"name":"register_ind","type":"boolean","default":false}]}""")
    assert(ConvertValue.flatten(c, Map("msisdn" -> "79099421523")) ==
      Right(Vector("79099421523", false)))
  }

  // ---- namespace.lua: dotted names and namespace scoping ----

  test("namespace.lua: error paths carry the namespaced full name") {
    assert(createErr("""{"type":"record","name":"Y","namespace":"X"}""") ==
      "X.Y: Record type must have \"fields\"")
    assert(createErr("""{"type":"record","name":"X.Y","namespace":"Z"}""") ==
      "X.Y: Record type must have \"fields\"")
    assert(createErr("""{"type":"record","name":"Y","namespace":"X",
      "fields":[{"name":"field1","type":"W"}]}""") ==
      "X.Y/field1: Unknown Avro type: X.W")
    assert(createErr("""{"type":"record","name":"X.Y","namespace":"Z",
      "fields":[{"name":"field1","type":"W"}]}""") ==
      "X.Y/field1: Unknown Avro type: X.W")
    assert(createErr("""{"type":"record","name":"Y","namespace":"X",
      "fields":[{"name":"field1","type":"Z.W"}]}""") ==
      "X.Y/field1: Unknown Avro type: Z.W")
  }
}
