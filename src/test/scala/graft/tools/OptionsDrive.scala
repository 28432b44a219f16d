package graft.tools
import graft.schema._
import graft.ops.{ConvertValue, FlattenOps}
object OptionsDrive {
  def main(args: Array[String]): Unit = {
    // xflatten via the package boundary
    val c = FlattenOps.compile(Avro.create("""{"name":"p","type":"record",
      "fields":[{"name":"a","type":"int"},{"name":"b","type":"string"},
      {"name":"u","type":["null","long"]}]}"""))
      .fold(e => sys.error(e), identity)
    println("X1=" + ConvertValue.xflatten(c, Map("b" -> "hi")))
    println("X2=" + ConvertValue.xflatten(c, Map("u" -> Map("long" -> 5L), "a" -> 1L)))
    println("X3=" + ConvertValue.xflatten(c, Map("zz" -> 1)))
    println("X4=" + ConvertValue.xflatten(c, Map.empty[String, Any])) // empty update
    // preserve options via the package boundary
    val json = """{"name":"r","type":"record","doc_url":"http://x","fields":[
      {"name":"a","type":"int"}]}"""
    println("P_PLAIN=" + Avro.create(json).exportString)
    val kept = Avro.create(json, CreateOptions(preserveInAst = Seq("doc_url")))
    println("P_KEPT=" + kept.exportString)
    println("P_FP_SAME=" + (Avro.fingerprintHex(kept) ==
      Avro.fingerprintHex(Avro.create(json))))
    val fp = Avro.create(json, CreateOptions(preserveInAst = Seq("doc_url"),
      preserveInFingerprint = Seq("doc_url")))
    println("P_FP_DIFF=" + (Avro.fingerprintHex(fp) !=
      Avro.fingerprintHex(Avro.create(json))))
    // probe: re-create from preserved export round-trips
    println("P_RT=" + (Avro.create(kept.exportString,
      CreateOptions(preserveInAst = Seq("doc_url"))).exportString ==
      kept.exportString))
  }
}
