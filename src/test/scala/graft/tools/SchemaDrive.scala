package graft.tools
import graft.schema._
/** Manual end-to-end driver for the schema public API (used by /verify). */
object SchemaDrive {
  def main(args: Array[String]): Unit = {
    val person = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"FirstName","type":"string"},{"name":"LastName","type":"string"},
      {"name":"Age","type":"int"}]}""")
    println("NAMES=" + person.getNames().mkString(","))
    println("TYPES=" + person.getTypes().mkString(","))
    println("OK=" + ValidateValue.validate(person, Map("FirstName"->"John","LastName"->"Doe","Age"->33L)))
    println("ERR1=" + ValidateValue.validate(person, Map("FirstName"->42L,"LastName"->"Doe","Age"->33L)))
    println("ERR2=" + ValidateValue.validate(person, Map("FirstName"->"J")))
    println("EXPORT=" + person.exportString)
    println("FP=" + Avro.fingerprintHex(person))
    val person2 = Avro.create("""{"name":"person","type":"record","fields":[
      {"name":"Age","type":"long"},{"name":"FirstName","type":"string"},
      {"name":"LastName","type":"string"},{"name":"Email","type":"string","default":""}]}""")
    println("COMPAT=" + Avro.areCompatible(person, person2))
    println("COMPAT_REV=" + Avro.areCompatible(person2, person))
    println("P1=" + (try Avro.create("{not json").toString catch { case e: Throwable => "caught: " + e.getClass.getSimpleName }))
    println("P2=" + (try Avro.create("""{"type":"enum","name":"E","symbols":["привет"]}""").toString catch { case e: AvroSchemaError => "caught: " + e.fullMessage }))
    println("P3=" + Avro.create("""{"type":"enum","name":"E","symbols":["привет"]}""", CreateOptions(utf8Enums=true)).toString)
    println("P4=" + (try Avro.create("""{"name":"r","type":"record","fields":[{"name":"a","type":"Undefined"}]}""").toString catch { case e: AvroSchemaError => "caught: " + e.fullMessage }))
    println("P5=" + (try { Avro.create("""{"name":"r","type":"record","fields":[{"name":"a","type":"fwd"}]}""", CreateOptions(forwardReference=true)); "no error (fwd unresolved!)" } catch { case e: AvroSchemaError => "caught: " + e.fullMessage }))
    val rec = Avro.create("""{"name":"node","type":"record","fields":[{"name":"next","type":["null","node"]},{"name":"label","type":"string"}]}""")
    println("P6_recursive_validate=" + ValidateValue.validate(rec, Map("label"->"L1","next"->Map("node"->Map("label"->"L2","next"->null)))))
  }
}
