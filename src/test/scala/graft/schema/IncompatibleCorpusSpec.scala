package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Evolution-rejection matrix ported from the reference DDT corpus
  * (test/ddt_suite/incompatible.lua — 221 systematic pairwise cases — plus
  * incompatible_{enum,fixed,record,array,map}.lua). The pairwise matrix is
  * generated from the same rules the Lua file enumerates by hand: only
  * same-type and the Avro promotion pairs compile; everything else is
  * `Types incompatible: <from> and <to>` with named types reported by name.
  */
class IncompatibleCorpusSpec extends AnyFunSuite {

  private val array = """{"type":"array","items":"int"}"""
  private val map = """{"type":"map", "values":"int"}"""
  private val fixed = """{"name":"foo", "type":"fixed", "size":16}"""
  private val record =
    """{"name":"foo", "type":"record", "fields":[{"name":"_","type":"int"}]}"""
  private val enum_ = """{"name":"foo", "type":"enum", "symbols":["_"]}"""

  private def resolve(w: String, r: String,
      downgrade: Boolean = false): Either[String, _] =
    Compat.resolve(Avro.create(w), Avro.create(r), downgrade)

  private def errOf(w: String, r: String): String =
    resolve(w, r).swap.getOrElse(sys.error(s"expected error: $w -> $r"))

  // display name used in 'Types incompatible' (incompatible.lua: named
  // types print their name)
  private val bases: Seq[(String, String)] = Seq(
    "\"null\"" -> "null", "\"boolean\"" -> "boolean", "\"int\"" -> "int",
    "\"long\"" -> "long", "\"float\"" -> "float", "\"double\"" -> "double",
    "\"string\"" -> "string", "\"bytes\"" -> "bytes",
    (array, "array"), (map, "map"), (fixed, "foo"), (record, "foo"),
    (enum_, "foo"))

  // writer display -> reader displays it may evolve into (besides itself)
  private val promotions = Map(
    "int" -> Set("long", "float", "double"),
    "long" -> Set("float", "double"),
    "float" -> Set("double"),
    "string" -> Set("bytes"),
    "bytes" -> Set("string"))

  test("incompatible.lua: full base-type pair matrix") {
    for (((ws, wd), wi) <- bases.zipWithIndex;
         ((rs, rd), ri) <- bases.zipWithIndex) {
      val ok = wi == ri ||
        promotions.get(wd).exists(_.contains(rd))
      val res = resolve(ws, rs)
      if (ok) assert(res.isRight, s"$wd -> $rd should compile: $res")
      else {
        assert(res == Left(s"Types incompatible: $wd and $rd"),
          s"$wd -> $rd")
      }
    }
  }

  test("incompatible.lua: scalar vs union") {
    assert(errOf("\"null\"", """["int","string"]""") ==
      "<union>: No common types")
    assert(errOf("\"int\"", """["null","string"]""") ==
      "<union>: No common types")
    assert(resolve("\"int\"", """["int","string"]""").isRight)
    assert(resolve("\"long\"", """["null","long"]""").isRight)
    assert(resolve("\"float\"", """["null","float"]""").isRight)
    assert(resolve("\"double\"", """["null","double"]""").isRight)
  }

  test("incompatible_enum.lua: symbols and aliases") {
    assert(errOf("""{"name":"foo","type":"enum","symbols":["A","B","C"]}""",
      """{"name":"foo","type":"enum","symbols":["D"]}""") ==
      "foo: No common symbols")
    assert(errOf("""{"name":"foo","type":"enum","symbols":["A","B","C"]}""",
      """{"name":"xfoo","type":"enum","symbols":["B"]}""") ==
      "Types incompatible: foo and xfoo")
    assert(resolve(
      """{"name":"foo","type":"enum","symbols":["A","B","C"]}""",
      """{"name":"xfoo","type":"enum","symbols":["B"],"aliases":["foo"]}""")
      .isRight)
    assert(errOf(
      """{"name":"foo","type":"enum","symbols":["A","B","C"],"aliases":["xfoo"]}""",
      """{"name":"xfoo","type":"enum","symbols":["B"]}""") ==
      "Types incompatible: foo and xfoo")
    assert(resolve(
      """{"name":"foo","type":"enum","symbols":["A","B","C"],"aliases":["xfoo"]}""",
      """{"name":"xfoo","type":"enum","symbols":["B"]}""",
      downgrade = true).isRight)
  }

  test("incompatible_fixed.lua: size and aliases") {
    assert(errOf("""{"name":"blob","type":"fixed","size":16}""",
      """{"name":"blob","type":"fixed","size":17}""") ==
      "blob: Size mismatch: 16 vs 17")
    assert(errOf("""{"name":"blob","type":"fixed","size":16}""",
      """{"name":"xblob","type":"fixed","size":16}""") ==
      "Types incompatible: blob and xblob")
    assert(resolve("""{"name":"blob","type":"fixed","size":16}""",
      """{"name":"xblob","type":"fixed","size":16,"aliases":["blob"]}""")
      .isRight)
    assert(errOf(
      """{"name":"blob","type":"fixed","size":16,"aliases":["xblob"]}""",
      """{"name":"xblob","type":"fixed","size":16}""") ==
      "Types incompatible: blob and xblob")
    assert(resolve(
      """{"name":"blob","type":"fixed","size":16,"aliases":["xblob"]}""",
      """{"name":"xblob","type":"fixed","size":16}""",
      downgrade = true).isRight)
  }

  test("incompatible_array/map.lua: element type paths") {
    assert(errOf("""{"type":"array","items":"int"}""",
      """{"type":"array","items":"string"}""") ==
      "<array>: Types incompatible: int and string")
    assert(errOf("""{"type":"map","values":"int"}""",
      """{"type":"map","values":"string"}""") ==
      "<map>: Types incompatible: int and string")
  }

  private def rec1(name: String, fname: String, ftype: String,
      faliases: String = "", raliases: String = ""): String = {
    val fa = if (faliases.isEmpty) "" else s""","aliases":[$faliases]"""
    val ra = if (raliases.isEmpty) "" else s""","aliases":[$raliases]"""
    s"""{"name":"$name","type":"record","fields":[
      {"name":"$fname","type":"$ftype"$fa}]$ra}"""
  }

  test("incompatible_record.lua: fields, aliases, downgrade") {
    assert(errOf(rec1("foo", "A", "int"), rec1("foo", "A", "string")) ==
      "foo/A: Types incompatible: int and string")
    assert(errOf(rec1("foo", "A", "int"), rec1("foo", "B", "string")) ==
      "foo: Field B is missing in source schema, " +
        "and no default value was provided")
    assert(errOf(rec1("foo", "A", "int"),
      rec1("foo", "B", "string", faliases = "\"A\"")) ==
      "foo/(A aka B): Types incompatible: int and string")
    assert(errOf(rec1("foo", "A", "int", faliases = "\"B\""),
      rec1("foo", "B", "string")) ==
      "foo: Field B is missing in source schema, " +
        "and no default value was provided")
    assert(resolve(rec1("foo", "A", "int", faliases = "\"B\""),
      rec1("foo", "B", "int"), downgrade = true).isRight)
    assert(Compat.resolve(
      Avro.create(rec1("foo", "A", "int", faliases = "\"B\"")),
      Avro.create(rec1("foo", "B", "string")), downgrade = true) ==
      Left("foo/(A aka B): Types incompatible: int and string"))
    assert(errOf(rec1("foo", "A", "int"), rec1("xfoo", "A", "string")) ==
      "Types incompatible: foo and xfoo")
    assert(errOf(rec1("foo", "A", "int"),
      rec1("xfoo", "A", "string", raliases = "\"foo\"")) ==
      "(foo aka xfoo)/A: Types incompatible: int and string")
    assert(errOf(rec1("foo", "A", "int", raliases = "\"xfoo\""),
      rec1("xfoo", "A", "string")) ==
      "Types incompatible: foo and xfoo")
    assert(Compat.resolve(
      Avro.create(rec1("foo", "A", "int", raliases = "\"xfoo\"")),
      Avro.create(rec1("xfoo", "A", "string")), downgrade = true) ==
      Left("(foo aka xfoo)/A: Types incompatible: int and string"))
  }
}
