package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases ported from the reference DDT corpus
  * (reference: test/ddt_suite/invalid.lua, record.lua, recursive.lua,
  * test/api_tests/var.lua). Schemas are data; expected error strings are the
  * reference's exact contracts.
  */
class SchemaSpec extends AnyFunSuite {

  private def createErr(schema: String): String =
    intercept[AvroSchemaError](Avro.create(schema)).fullMessage

  test("primitive create + normalization") {
    assert(Avro.create("\"int\"").resolve(Avro.create("\"int\"").root) ==
      PrimitiveType("int"))
    assert(Avro.create("{\"type\":\"int\"}").root == PrimitiveType("int"))
    assert(Avro.create("\"string*\"").root == PrimitiveType("string", true))
  }

  test("invalid.lua: unknown types") {
    assert(createErr("42") == "Unknown Avro type: 42")
    assert(createErr("\"bad_type\"") == "Unknown Avro type: bad_type")
    assert(createErr("{}") == "Must have a \"type\"")
  }

  test("invalid.lua: fixed") {
    assert(createErr("""{"type":"fixed"}""") == "<fixed>: Must have a \"name\"")
    assert(createErr("""{"type":"fixed","name":42}""") ==
      "<fixed>: Bad type name: 42")
    assert(createErr("""{"type":"fixed","name":"blob","aliases":42}""") ==
      "blob: Property \"aliases\" must be a list")
    assert(createErr("""{"type":"fixed","name":"blob","aliases":[42]}""") ==
      "blob: Bad type name: 42")
    assert(createErr("""{"type":"fixed","name":"blob","aliases":["blob"]}""") ==
      "blob: Alias type name already defined: blob")
    assert(createErr("""{"type":"fixed","name":"blob"}""") ==
      "blob: Fixed type must have \"size\"")
    assert(createErr("""{"type":"fixed","name":"blob","size":false}""") ==
      "blob: Bad fixed type size: false")
    assert(createErr("""{"type":"fixed","name":"blob","size":4.1}""") ==
      "blob: Bad fixed type size: 4.1")
    assert(createErr("""{"type":"fixed","name":"blob","size":-10}""") ==
      "blob: Bad fixed type size: -10")
  }

  test("invalid.lua: enum") {
    assert(createErr("""{"type":"enum"}""") == "<enum>: Must have a \"name\"")
    assert(createErr("""{"type":"enum","name":42}""") ==
      "<enum>: Bad type name: 42")
    assert(createErr("""{"type":"enum","name":"test"}""") ==
      "test: Enum type must have \"symbols\"")
    assert(createErr("""{"type":"enum","name":"test","symbols":42}""") ==
      "test: Enum \"symbols\" must be a list")
    assert(createErr("""{"type":"enum","name":"test","symbols":[]}""") ==
      "test: Enum type must contain at least one symbol")
    assert(createErr("""{"type":"enum","name":"test","symbols":[-1]}""") ==
      "test: Bad enum symbol name: -1")
    assert(createErr(
      """{"type":"enum","name":"test","symbols":["APPLES","APPLES"]}""") ==
      "test: Enum contains symbol APPLES twice")
  }

  test("invalid.lua: array/map/union") {
    assert(createErr("""{"type":"array"}""") ==
      "<array>: Array type must have \"items\"")
    assert(createErr("""{"type":"array","items":42}""") ==
      "<array>: Unknown Avro type: 42")
    assert(createErr("""{"type":"map"}""") ==
      "<map>: Map type must have \"values\"")
    assert(createErr("""{"type":"map","values":42}""") ==
      "<map>: Unknown Avro type: 42")
    assert(createErr("""[]""") == "Union type must have at least one branch")
    assert(createErr("""["int","int"]""") ==
      "<union>/<branch-2>: Union contains int twice")
    assert(createErr(
      """[{"type":"array","items":"int"},{"type":"array","items":"string"}]""") ==
      "<union>/<branch-2>: Union contains array twice")
    assert(createErr("""["int",["string"]]""") ==
      "<union>/<branch-2>: Union may not immediately contain other unions")
  }

  test("invalid.lua: record") {
    assert(createErr("""{"type":"record"}""") ==
      "<record>: Must have a \"name\"")
    assert(createErr("""{"type":"record","name":42}""") ==
      "<record>: Bad type name: 42")
    assert(createErr("""{"type":"record","name":"FooBar"}""") ==
      "FooBar: Record type must have \"fields\"")
    assert(createErr("""{"type":"record","name":"FooBar","fields":42}""") ==
      "FooBar: Record \"fields\" must be a list")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[]}""") ==
      "FooBar: Record type must have at least one field")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[42]}""") ==
      "FooBar/<field-1>: Record field must be a list")
    assert(createErr(
      """{"type":"record","name":"FooBar","fields":[{}]}""") ==
      "FooBar/<field-1>: Record field must have a \"name\"")
    assert(createErr(
      """{"type":"record","name":"FooBar","fields":[{"name":42}]}""") ==
      "FooBar/<field-1>: Bad record field name: 42")
    assert(createErr(
      """{"type":"record","name":"FooBar","fields":[{"name":"A"}]}""") ==
      "FooBar/A: Record field must have a \"type\"")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int"},{"name":"A","type":"int"}]}""") ==
      "FooBar/<field-2>: Record contains field A twice")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int","aliases":42}]}""") ==
      "FooBar/A: Property \"aliases\" must be a list")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int","aliases":[42]}]}""") ==
      "FooBar/A: Bad field alias name: 42")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int"},
        {"name":"B","type":"int","aliases":["A"]}]}""") ==
      "FooBar/B: Alias field name already defined: A")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int"}],"aliases":["FooBar"]}""") ==
      "FooBar: Alias type name already defined: FooBar")
  }

  test("invalid.lua: direct containment rejected, indirection allowed") {
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int"},{"name":"B","type":"FooBar"}]}""") ==
      "Record FooBar contains itself via B")
    assert(createErr("""{"type":"record","name":"FooBar","fields":[
        {"name":"A","type":"int"},
        {"name":"B","type":{"type":"record","name":"Inner","fields":[
          {"name":"X","type":"FooBar"}]}}]}""") ==
      "Record FooBar contains itself via B/X")
    // legal: recursion through union / array / map
    Avro.create("""{"type":"record","name":"FooBar","fields":[
      {"name":"A","type":"int"},{"name":"B","type":["int","FooBar"]}]}""")
    Avro.create("""{"type":"record","name":"FooBar","fields":[
      {"name":"A","type":"int"},
      {"name":"B","type":{"type":"array","items":"FooBar"}}]}""")
    Avro.create("""{"type":"record","name":"FooBar","fields":[
      {"name":"A","type":"int"},
      {"name":"B","type":{"type":"map","values":"FooBar"}}]}""")
  }

  test("F4 recursive node schema parses") {
    val s = Avro.create("""{"name":"node","type":"record","fields":[
      {"name":"next","type":["null","node"]},
      {"name":"label","type":"string"}]}""")
    val rec = s.rootRecord
    assert(rec.fields.map(_.name) == Vector("next", "label"))
    assert(s.resolve(rec.fields(0).tpe).isInstanceOf[UnionType])
  }

  test("get_names / get_types contract (api_tests/var.lua)") {
    val s = Avro.create("""{"type":"record","name":"X","fields":[
      {"name":"x1","type":"string*"},
      {"name":"x2","type":{"type":"record","name":"Y","fields":[
        {"name":"y1","type":"string"},{"name":"y2","type":"long"}]}},
      {"name":"x3","type":{"type":"record*","name":"Z","fields":[
        {"name":"z1","type":"string*"},{"name":"z2","type":"long*"}]}},
      {"name":"x4","type":["int","string*"]},
      {"name":"x5","type":{"type":"array*","items":"int*"}},
      {"name":"x6","type":{"type":"map","values":"float"}},
      {"name":"x7","type":{"type":"fixed*","name":"W","size":5}}]}""")
    assert(s.getNames() == Vector("x1", "x2.y1", "x2.y2", "x3",
      "x4.$type$", "x4", "x5", "x6", "x7"))
    assert(s.getNames(Seq("string", "int")) ==
      Vector("$service_field$", "$service_field$", "x1", "x2.y1", "x2.y2",
        "x3", "x4.$type$", "x4", "x5", "x6", "x7"))
    assert(s.getTypes() == Vector("string*", "string", "long", "record*",
      "union_type", "union_value", "array*", "map", "fixed*"))
    assert(s.getTypes(Seq("string", "int")) ==
      Vector("string", "int", "string*", "string", "long", "record*",
        "union_type", "union_value", "array*", "map", "fixed*"))
  }

  test("validate: F1 person golden errors (record.lua)") {
    val person = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"FirstName","type":"string"},{"name":"LastName","type":"string"},
      {"name":"Age","type":"int"},{"name":"Sex","type":"int"},
      {"name":"PhoneNumber","type":"string"},
      {"name":"HomeAddress","type":"string"},
      {"name":"Occupation","type":"string"}]}""")
    def v(data: Any) = ValidateValue.validate(person, data)
    assert(v(42L) == Left("Not a person: 42"))
    assert(v(Map("InvalidKey" -> 1L)) == Left("InvalidKey: Unknown field"))
    val good = Map("FirstName" -> "John", "LastName" -> "Doe", "Age" -> 33L,
      "Sex" -> 1L, "PhoneNumber" -> "+7", "HomeAddress" -> "Street",
      "Occupation" -> "Engineer")
    assert(v(good).isRight)
    assert(v(good.updated("FirstName", 42L)) ==
      Left("FirstName: Not a string: 42"))
    assert(v(good.updated("Age", 1.5)) == Left("Age: Not a int: 1.5"))
    assert(v(good - "FirstName") == Left("Field FirstName missing"))
    assert(v(good.updated("Age", 4000000000L)) ==
      Left("Age: Not a int: 4000000000"))
  }

  test("validate: F3 union golden errors (validate.lua:355–385)") {
    val u = Avro.create("""["int","string","double"]""")
    def v(data: Any) = ValidateValue.validate(u, data)
    assert(v(Map("int" -> 42L)).isRight)
    assert(v(Map("!!!" -> 1L)) == Left("!!!: Unexpected key in union"))
    assert(v(42L) == Left("Not a union: 42"))
    assert(v(null) == Left("Unexpected type in union: null"))
    assert(v(Map("int" -> "x")) == Left("int: Not a int: x"))
    assert(v(Map("string" -> 42L)) == Left("string: Not a string: 42"))
    assert(v(Map("double" -> "x")) == Left("double: Not a double: x"))
    // numbers are acceptable floats/doubles (validate.lua:162–230)
    assert(v(Map("double" -> 42L)) == Right(Map("double" -> 42.0)))
  }

  test("validate: defaults fill + nullable substitution") {
    val s = Avro.create("""{"name":"r","type":"record","fields":[
      {"name":"a","type":"int","default":7},
      {"name":"b","type":"string*"},
      {"name":"c","type":["null","int"]},
      {"name":"d","type":"int"}]}""")
    assert(ValidateValue.validate(s, Map("d" -> 1L)) ==
      Right(Map("a" -> 7L, "b" -> null, "c" -> null, "d" -> 1L)))
  }

  test("bad default rejected at create") {
    val e = intercept[AvroSchemaError](Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"a","type":"int","default":"oops"}]}"""))
    assert(e.fullMessage.contains("Default value not valid"))
  }

  test("auto defaults (init.lua:77–121)") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"a","type":"int"},{"name":"b","type":"string"},
        {"name":"e","type":{"type":"enum","name":"E","symbols":["X","Y"]}}]}""",
      CreateOptions(autoDefaults = true))
    assert(ValidateValue.validate(s, Map.empty[String, Any]) ==
      Right(Map("a" -> 0L, "b" -> "", "e" -> "X")))
  }

  test("canonical form + SHA-256 fingerprint match Avro Java (PCF oracle)") {
    // Avro's SchemaNormalization is an INDEPENDENT implementation of
    // Parsing Canonical Form — byte-equality here pins our canonical
    // form and digest to the published spec, not just to ourselves
    val cases = Seq(
      """{"name":"person","type":"record","fields":[
        {"name":"FirstName","type":"string"},{"name":"Age","type":"int"},
        {"name":"Score","type":"double"},
        {"name":"Stats","type":{"type":"record","name":"Stats","fields":[
          {"name":"s1","type":"long"},{"name":"s2","type":"long"}]}}]}""",
      """{"type":"enum","name":"Suit",
        "symbols":["SPADES","HEARTS","CLUBS"]}""",
      """{"type":"array","items":{"type":"map","values":"bytes"}}""",
      """{"name":"u","type":"record","fields":[
        {"name":"pv","type":["null","int","string"]}]}""",
      """{"type":"fixed","name":"Hash","size":16}""",
      """{"name":"ns.Rec","type":"record","fields":[
        {"name":"self","type":["null","ns.Rec"]}]}""")
    for (json <- cases) {
      val ours = Avro.create(json)
      val theirs = new org.apache.avro.Schema.Parser().parse(json)
      assert(SchemaIO.canonicalForm(ours) ==
        org.apache.avro.SchemaNormalization.toParsingForm(theirs),
        s"canonical form diverges for $json")
      assert(SchemaIO.fingerprint(ours, "SHA-256", 32).toSeq ==
        org.apache.avro.SchemaNormalization
          .parsingFingerprint("SHA-256", theirs).toSeq,
        s"fingerprint diverges for $json")
    }
  }

  test("export round-trip + fingerprint stability") {
    val json = """{"name":"person","type":"record","fields":[
      {"name":"FirstName","type":"string"},{"name":"Age","type":"int"}]}"""
    val s = Avro.create(json)
    val exported = s.exportString
    val s2 = Avro.create(exported)
    assert(s2.exportString == exported)
    assert(Avro.fingerprintHex(s) == Avro.fingerprintHex(s2))
    assert(Avro.fingerprintHex(s).length == 16) // 8 bytes hex
    // different schema → different fingerprint
    val s3 = Avro.create(json.replace("Age", "Age2"))
    assert(Avro.fingerprintHex(s) != Avro.fingerprintHex(s3))
  }

  test("preserve_in_ast / preserve_in_fingerprint (init.lua:123-151)") {
    val json = """{"name":"r","type":"record","extra_meta":"v1",
      "other":"x","fields":[{"name":"a","type":"int"}]}"""
    val plain = Avro.create(json)
    assert(!plain.exportString.contains("extra_meta"))
    val kept = Avro.create(json,
      CreateOptions(preserveInAst = Seq("extra_meta")))
    assert(kept.exportString.contains("\"extra_meta\":\"v1\""))
    assert(!kept.exportString.contains("\"other\""))
    // not in fingerprint unless preserve_in_fingerprint
    assert(Avro.fingerprintHex(kept) == Avro.fingerprintHex(plain))
    val fp = Avro.create(json, CreateOptions(
      preserveInAst = Seq("extra_meta"),
      preserveInFingerprint = Seq("extra_meta")))
    assert(Avro.fingerprintHex(fp) != Avro.fingerprintHex(plain))
    // fingerprint set must be subset of ast set
    val e = intercept[AvroSchemaError](Avro.create(json,
      CreateOptions(preserveInFingerprint = Seq("extra_meta"))))
    assert(e.fullMessage.contains("subset"))
  }

  test("is") {
    assert(Avro.isSchema(Avro.create("\"int\"")))
    assert(!Avro.isSchema(42))
    assert(!Avro.isSchema("int"))
  }

  test("F5 evolution: compatible reorder/widen/narrow (record_version.lua)") {
    val foo = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"A","type":"int","default":1001},
      {"name":"B","type":"int","default":1002},
      {"name":"C","type":"int","default":1003},
      {"name":"D","type":"int","default":1004}]}""")
    val fooReversed = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"D","type":"int","default":1004},
      {"name":"C","type":"int","default":1003},
      {"name":"B","type":"int","default":1002},
      {"name":"A","type":"int","default":1001}]}""")
    val fooReduced = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"A","type":"int","default":1001},
      {"name":"B","type":"int","default":1002}]}""")
    assert(Avro.areCompatible(foo, fooReversed).isRight)
    assert(Avro.areCompatible(foo, fooReduced).isRight)
    assert(Avro.areCompatible(fooReduced, foo).isRight)
    // promotions
    val i = Avro.create("\"int\"")
    val l = Avro.create("\"long\"")
    val d = Avro.create("\"double\"")
    assert(Avro.areCompatible(i, l).isRight)
    assert(Avro.areCompatible(i, d).isRight)
    assert(Avro.areCompatible(l, i).isLeft)
    assert(Avro.areCompatible(l, i).swap.getOrElse("") ==
      "Types incompatible: long and int")
  }

  test("evolution: missing field without default fails") {
    val w = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"A","type":"int"}]}""")
    val r = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"A","type":"int"},{"name":"B","type":"int"}]}""")
    val res = Avro.areCompatible(w, r)
    assert(res == Left(
      "foo: Field B is missing in source schema, and no default value was provided"))
  }

  test("evolution: alias rename + downgrade") {
    val w = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"OldName","type":"int"}]}""")
    val r = Avro.create("""{"name":"foo","type":"record","fields":[
      {"name":"NewName","type":"int","aliases":["OldName"]}]}""")
    assert(Avro.areCompatible(w, r).isRight)
    // reverse direction fails without downgrade (no default for OldName)
    assert(Avro.areCompatible(r, w).isLeft)
    // downgrade reverses alias matching
    assert(Avro.areCompatible(r, w, downgrade = true).isRight)
  }

  test("evolution: enum symbol mapping") {
    val e1 = Avro.create(
      """{"type":"enum","name":"E","symbols":["A","B","C"]}""")
    val e2 = Avro.create(
      """{"type":"enum","name":"E","symbols":["C","B","X"]}""")
    val m = Compat.resolve(e1, e2)
    assert(m.isRight)
    val em = m.toOption.get.asInstanceOf[Mapping.EnumM]
    assert(em.i2o == Vector(None, Some(1), Some(0)))
    val e3 = Avro.create("""{"type":"enum","name":"E","symbols":["Z"]}""")
    assert(Compat.resolve(e1, e3) == Left("E: No common symbols"))
  }
}
