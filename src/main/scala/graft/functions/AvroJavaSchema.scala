package graft.functions

import graft.schema._
import org.apache.avro.{Schema => JSchema, JsonProperties}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** AvroType → Apache Avro (Java) `Schema` for the binary encode/decode
  * path — the analog of the reference's `*_msgpack` fast path
  * (reference: README.md:250–255, init.lua:462–470), with the nullable-`*`
  * extension lowered to standard `["null", T]` unions.
  */
object AvroJavaSchema {

  def toJava(s: AvroSchema): JSchema =
    convert(s, s.root, mutable.Map.empty)

  private def nullableWrap(inner: JSchema): JSchema =
    if (inner.getType == JSchema.Type.UNION) inner
    else JSchema.createUnion(JSchema.create(JSchema.Type.NULL), inner)

  private def convert(s: AvroSchema, t0: AvroType,
      done: mutable.Map[String, JSchema]): JSchema = {
    val t = s.resolve(t0)
    val base = t match {
      case PrimitiveType("null", _) => JSchema.create(JSchema.Type.NULL)
      case PrimitiveType("boolean", _) => JSchema.create(JSchema.Type.BOOLEAN)
      case PrimitiveType("int", _) => JSchema.create(JSchema.Type.INT)
      case PrimitiveType("long", _) => JSchema.create(JSchema.Type.LONG)
      case PrimitiveType("float", _) => JSchema.create(JSchema.Type.FLOAT)
      case PrimitiveType("double", _) => JSchema.create(JSchema.Type.DOUBLE)
      case PrimitiveType("bytes", _) => JSchema.create(JSchema.Type.BYTES)
      case PrimitiveType("string", _) => JSchema.create(JSchema.Type.STRING)
      case PrimitiveType(other, _) =>
        throw new AvroSchemaError(s"Type $other unsupported in binary path")
      case e: EnumType => done.getOrElseUpdate(e.fullName, {
        val js = JSchema.createEnum(e.name, null, e.namespace.orNull,
          e.symbols.asJava)
        e.aliases.foreach(js.addAlias)
        js
      })
      case f: FixedType => done.getOrElseUpdate(f.fullName, {
        val js = JSchema.createFixed(f.name, null, f.namespace.orNull, f.size)
        f.aliases.foreach(js.addAlias)
        js
      })
      case a: ArrayType => JSchema.createArray(convert(s, a.items, done))
      case m: MapType => JSchema.createMap(convert(s, m.values, done))
      case u: UnionType =>
        JSchema.createUnion(u.branches.map(b => convert(s, b, done)).asJava)
      case r: RecordType =>
        done.get(r.fullName) match {
          case Some(js) => js
          case None =>
            val rec = JSchema.createRecord(r.name, null,
              r.namespace.orNull, false)
            done(r.fullName) = rec
            val fields = r.fields.map { f =>
              val fs = convert(s, f.tpe, done)
              val dflt: AnyRef = f.default.map(jsonToJava).getOrElse(
                if (SchemaConverters.isNullish(s, s.resolve(f.tpe)) &&
                    fs.getType == JSchema.Type.UNION &&
                    fs.getTypes.get(0).getType == JSchema.Type.NULL)
                  JsonProperties.NULL_VALUE
                else null)
              val jf = new JSchema.Field(f.name, fs, null, dflt)
              f.aliases.foreach(jf.addAlias)
              jf
            }
            rec.setFields(fields.asJava)
            r.aliases.foreach(rec.addAlias)
            rec
        }
      case _: Reference => throw new IllegalStateException("unresolved ref")
    }
    if (t.nullable && base.getType != JSchema.Type.NULL) nullableWrap(base)
    else base
  }

  /** JValue default → the java shape avro's Schema.Field accepts. */
  def jsonToJava(j: JValue): AnyRef = j match {
    case JNull => JsonProperties.NULL_VALUE
    case JBool(b) => java.lang.Boolean.valueOf(b)
    case JLong(n) => java.lang.Long.valueOf(n)
    case JDouble(d) => java.lang.Double.valueOf(d)
    case JString(s) => s
    case JArray(items) => items.map(jsonToJava).asJava
    case JObject(fields) =>
      val m = new java.util.LinkedHashMap[String, AnyRef]()
      fields.foreach { case (k, v) => m.put(k, jsonToJava(v)) }
      m
  }
}
