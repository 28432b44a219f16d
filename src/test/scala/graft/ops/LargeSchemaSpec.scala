package graft.ops

import graft.schema._
import org.scalatest.funsuite.AnyFunSuite

/** Large-schema stress from record_large.lua (64 defaulted fields) and
  * compile_large.lua (wide nested record) — generated programmatically,
  * same shapes as the reference bundles.
  */
class LargeSchemaSpec extends AnyFunSuite {

  private def compiled(json: String): Compiled =
    FlattenOps.compile(Avro.create(json)).fold(e => sys.error(e), identity)

  test("record_large.lua: 64 defaulted fields, partial inputs fill") {
    val fields = (1 to 64).map(i =>
      f"""{"name":"f$i%02d","type":"int","default":${1000 + i}}""")
      .mkString(",")
    val c = compiled(
      s"""{"name":"large","type":"record","fields":[$fields]}""")
    // empty input → all defaults in order
    assert(ConvertValue.flatten(c, Map.empty[String, Any]) ==
      Right((1 to 64).map(i => (1000 + i).toLong).toVector))
    // sparse input overrides only its slots
    val sparse = Map("f01" -> 1L, "f32" -> 2L, "f64" -> 3L)
    val flat = ConvertValue.flatten(c, sparse).toOption.get
    assert(flat(0) == 1L && flat(31) == 2L && flat(63) == 3L)
    assert(flat(1) == 1002L && flat(62) == 1063L)
    // round-trip
    val back = ConvertValue.unflatten(c, flat).toOption.get
      .asInstanceOf[Map[String, Any]]
    assert(back("f01") == 1L && back("f02") == 1002L && back("f64") == 3L)
    assert(back.size == 64)
  }

  test("compile_large.lua: wide nested record compiles and round-trips") {
    // 10 nested records x 10 long/string fields each
    val nested = (1 to 10).map { r =>
      val fs = (1 to 10).map { f =>
        val t = if (f % 2 == 0) "\"string\"" else "\"long\""
        s"""{"name":"n${r}_f$f","type":$t}"""
      }.mkString(",")
      s"""{"name":"sub$r","type":{"type":"record","name":"type_$r",
        "fields":[$fs]}}"""
    }.mkString(",")
    val c = compiled(
      s"""{"name":"wide","type":"record","fields":[$nested]}""")
    assert(c.reader.getNames().length == 100)
    val value = (1 to 10).map { r =>
      s"sub$r" -> (1 to 10).map { f =>
        s"n${r}_f$f" -> (if (f % 2 == 0) s"v$r-$f" else (r * 100 + f).toLong)
      }.toMap
    }.toMap
    val flat = ConvertValue.flatten(c, value)
    assert(flat.isRight)
    assert(flat.toOption.get.length == 100)
    val back = ConvertValue.unflatten(c, flat.toOption.get)
    assert(back.toOption.get.asInstanceOf[Map[String, Any]]("sub7")
      .asInstanceOf[Map[String, Any]]("n7_f2") == "v7-2")
  }
}
