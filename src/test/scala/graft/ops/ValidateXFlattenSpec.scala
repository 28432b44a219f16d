package graft.ops

import graft.SparkTestBase
import graft.schema._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class ValidateXFlattenSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("validate flags missing mandatory fields with reference message") {
    val s = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"FirstName","type":"string"},
      {"name":"Age","type":"int"}]}""")
    val df = Seq(("John", Some(33)), (null, Some(1)), ("Jane", None))
      .toDF("FirstName", "Age")
    val out = Validate(s, df).select("_valid", "_error").collect()
    assert(out(0) == Row(true, null))
    assert(out(1) == Row(false, "Key missing: \"FirstName\""))
    assert(out(2) == Row(false, "Key missing: \"Age\""))
  }

  test("validate enum symbols and fixed length") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}},
      {"name":"fx","type":{"type":"fixed","name":"F4","size":4}}]}""")
    val df = Seq(
      ("A", "abcd".getBytes), ("Z", "abcd".getBytes), ("B", "ab".getBytes))
      .toDF("e", "fx")
    val out = Validate(s, df).select("_error").collect()
    assert(out(0) == Row(null))
    assert(out(1) == Row("e: Bad value: \"Z\""))
    assert(out(2) ==
      Row("fx: Expecting BIN of length 4. Encountered BIN of length 2."))
  }

  test("validate nullable fields accept null") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"string*"},
      {"name":"b","type":["null","int"]},
      {"name":"c","type":"int","default":7}]}""")
    val df = Seq((null: String, None: Option[Int], None: Option[Int]))
      .toDF("a", "b", "c")
    val out = Validate(s, df).select("_valid").head()
    assert(out == Row(true))
  }

  test("validate recurses into array elements (1-based index paths)") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"xs","type":{"type":"array","items":
        {"type":"enum","name":"E","symbols":["A","B"]}}}]}""")
    val df = Seq(Seq("A", "B"), Seq("A", "Z"), Seq("Q")).toDF("xs")
    val out = Validate(s, df).select("_error").collect()
    assert(out(0) == Row(null))
    assert(out(1) == Row("xs/2: Bad value: \"Z\""))
    assert(out(2) == Row("xs/1: Bad value: \"Q\""))
  }

  test("validate recurses into records inside arrays") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"xs","type":{"type":"array","items":
        {"name":"P","type":"record","fields":[
          {"name":"e","type":{"type":"enum","name":"E2",
            "symbols":["X","Y"]}},
          {"name":"k","type":"int"}]}}}]}""")
    val df = Seq(
      Seq(("X", Some(1))),
      Seq(("X", Some(1)), ("BAD", Some(2))),
      Seq(("Y", None: Option[Int]))).toDF("xs")
      .select($"xs".cast(
        "array<struct<e:string,k:int>>").as("xs"))
    val out = Validate(s, df).select("_error").collect()
    assert(out(0) == Row(null))
    assert(out(1) == Row("xs/2/e: Bad value: \"BAD\""))
    assert(out(2) == Row("xs/1: Key missing: \"k\""))
  }

  test("validate recurses into map values (key paths)") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"m","type":{"type":"map","values":
        {"type":"fixed","name":"F2","size":2}}}]}""")
    val df = Seq(
      Map("a" -> "ab".getBytes, "b" -> "cd".getBytes),
      Map("a" -> "ab".getBytes, "bad" -> "cde".getBytes)).toDF("m")
    val out = Validate(s, df).select("_error").collect()
    assert(out(0) == Row(null))
    assert(out(1) == Row(
      "m/bad: Expecting BIN of length 2. Encountered BIN of length 3."))
  }

  test("strict validate: exact validate-family errors per row") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"long"},
      {"name":"e","type":{"type":"enum","name":"E","symbols":["X","Y"]}}]}""")
    val df = Seq((1L, "X"), (2L, "Z"), (3L, null: String))
      .toDF("a", "e")
    val out = Validate.strict(s, df).select("_valid", "_error")
      .collect()
    assert(out(0) == Row(true, null))
    assert(out(1) == Row(false, "e: Not a E: Z"))
    assert(out(2) == Row(false, "Field e missing"))
  }

  test("F1 xflatten: present fields → [\"=\", pos, value] ops") {
    val s = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"FirstName","type":"string"},{"name":"LastName","type":"string"},
      {"name":"Age","type":"int"}]}""")
    val c = FlattenOps.compile(s).toOption.get
    // only LastName and Age present (FirstName NULL = absent)
    val df = Seq((null: String, "Doe", 33)).toDF("FirstName", "LastName", "Age")
    val ops = XFlatten(c, df).select("ops").head().getSeq[Row](0)
    assert(ops == Seq(Row("=", 2, "Doe"), Row("=", 3, "33")))
  }

  test("xflatten union field emits tag + value ops (compiler.lua:1002)") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"u","type":["null","int"]},
      {"name":"k","type":"int"}]}""")
    val c = FlattenOps.compile(s).toOption.get
    val df = Seq((Some(42), 7)).toDF("u", "k")
    val ops = XFlatten(c, df).select("ops").head().getSeq[Row](0)
    assert(ops == Seq(Row("=", 1, "1"), Row("=", 2, "42"), Row("=", 3, "7")))
  }

  test("xflatten with service fields offsets positions") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"string"},{"name":"b","type":"int"}]}""")
    val c = FlattenOps.compile(s, s, downgrade = false,
      Seq(org.apache.spark.sql.types.StringType)).toOption.get
    val df = Seq(("x", 1)).toDF("a", "b")
    val ops = XFlatten(c, df).select("ops").head().getSeq[Row](0)
    assert(ops == Seq(Row("=", 2, "x"), Row("=", 3, "1")))
  }

  // reference: api_tests/var.lua:325–338 + compiler.lua:978–994
  private val nullableRecSchema = Avro.create(
    """{"type":"record","name":"X","fields":[
      {"name":"y","type":{"name":"Y","type":"record*","fields":[
        {"name":"f1","type":"string"}]}},
      {"name":"k","type":"int"}]}""")

  test("xflatten nullable record is alpha-gated (value path)") {
    val c = FlattenOps.compile(nullableRecSchema).toOption.get
    val res = ConvertValue.xflatten(c, Map("y" -> Map("f1" -> "a")))
    assert(res.isLeft)
    assert(res.left.toOption.get.contains(
      "xflatten for nullable record is on developement stage"))
    // absent nullable record → other fields still flatten
    assert(ConvertValue.xflatten(c, Map("k" -> 5L)) ===
      Right(Vector(Vector("=", 2, 5L))))
  }

  test("xflatten nullable record is alpha-gated (Column path)") {
    val c = FlattenOps.compile(nullableRecSchema).toOption.get
    val df = Seq((Some(Tuple1("a")), Some(7)), (None, Some(8)))
      .toDF("y", "k")
    // absent rows pass; a present nullable record raises the gate error
    val absentOnly = df.filter($"y".isNull)
    val okOps = XFlatten(c, absentOnly).select("ops").head().getSeq[Row](0)
    assert(okOps == Seq(Row("=", 2, "8"))) // nullable record = 1 slot
    val e = intercept[Exception] {
      XFlatten(c, df).select("ops").collect()
    }
    assert(e.getMessage.contains(
      "xflatten for nullable record is on developement stage"))
  }

  test("xflatten nullable record works with the alpha option on") {
    val c = FlattenOps.compile(nullableRecSchema, nullableRecSchema,
      alphaNullableRecordXFlatten = true).toOption.get
    val vres = ConvertValue.xflatten(c, Map("y" -> Map("f1" -> "a")))
    assert(vres.isRight)
    val df = Seq(("a", 7)).toDF("f1v", "k")
      .select(org.apache.spark.sql.functions.struct($"f1v".as("f1")).as("y"),
        $"k")
    val ops = XFlatten(c, df).select("ops").head().getSeq[Row](0)
    assert(ops.map(_.getInt(1)) == Seq(1, 2))
  }
}
