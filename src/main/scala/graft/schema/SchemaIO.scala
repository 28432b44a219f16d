package graft.schema

import java.security.MessageDigest
import scala.collection.mutable

/** Schema export (canonical definition) and fingerprinting.
  *
  * Export reproduces the reference's normalized canonical definition —
  * repeated named types collapse to name strings, nullable types are spelled
  * with a trailing `*` (reference: frontend.lua:1272–1379 export_helper).
  *
  * Fingerprint follows Avro Parsing Canonical Form with the fixed key order
  * `name, type, fields, symbols, items, values, size` plus any
  * `preserve_in_fingerprint` extras, then a truncated digest
  * (reference: fingerprint.lua:36–86).
  */
object SchemaIO {

  def exportSchema(s: AvroSchema): JValue = {
    val emitted = mutable.Set.empty[String]
    render(s, s.root, emitted, forFingerprint = false)
  }

  def canonicalForm(s: AvroSchema): String = {
    val emitted = mutable.Set.empty[String]
    render(s, s.root, emitted, forFingerprint = true).render
  }

  def fingerprint(s: AvroSchema, algorithm: String, size: Int): Array[Byte] = {
    val algo = algorithm.toUpperCase match {
      case "SHA256" | "SHA-256" => "SHA-256"
      case "SHA1" | "SHA-1" => "SHA-1"
      case "MD5" => "MD5"
      case other => other
    }
    val digest = MessageDigest.getInstance(algo)
      .digest(canonicalForm(s).getBytes("UTF-8"))
    digest.take(size)
  }

  private def star(name: String, nullable: Boolean): String =
    if (nullable) name + "*" else name

  private def extras(s: AvroSchema, fullName: String,
      forFingerprint: Boolean): Vector[(String, JValue)] = {
    val kept = s.preserved.getOrElse(fullName, Vector.empty)
    if (forFingerprint)
      kept.filter { case (k, _) =>
        s.options.preserveInFingerprint.contains(k) }
    else kept
  }

  private def render(s: AvroSchema, t: AvroType, emitted: mutable.Set[String],
      forFingerprint: Boolean): JValue = t match {
    case PrimitiveType(n, nullable) => JString(star(n, nullable))
    case Reference(fn, nullable) =>
      val node = s.resolve(Reference(fn, nullable))
      node match {
        case named: NamedType if emitted(named.fullName) =>
          JString(star(named.fullName, nullable))
        case _ => render(s, node, emitted, forFingerprint)
      }
    case u: UnionType =>
      JArray(u.branches.map(render(s, _, emitted, forFingerprint)))
    case a: ArrayType =>
      JObject(Vector(
        "type" -> JString(star("array", a.nullable)),
        "items" -> render(s, a.items, emitted, forFingerprint)))
    case m: MapType =>
      JObject(Vector(
        "type" -> JString(star("map", m.nullable)),
        "values" -> render(s, m.values, emitted, forFingerprint)))
    case f: FixedType =>
      emitted += f.fullName
      val fields = Vector.newBuilder[(String, JValue)]
      fields += "name" -> JString(if (forFingerprint) f.fullName else f.name)
      if (!forFingerprint) f.namespace.foreach(ns =>
        fields += "namespace" -> JString(ns))
      fields += "type" -> JString(star("fixed", f.nullable))
      fields += "size" -> JLong(f.size)
      if (!forFingerprint && f.aliases.nonEmpty)
        fields += "aliases" -> JArray(f.aliases.map(JString))
      extras(s, f.fullName, forFingerprint).foreach(fields += _)
      orderKeys(fields.result(), forFingerprint)
    case e: EnumType =>
      emitted += e.fullName
      val fields = Vector.newBuilder[(String, JValue)]
      fields += "name" -> JString(if (forFingerprint) e.fullName else e.name)
      if (!forFingerprint) e.namespace.foreach(ns =>
        fields += "namespace" -> JString(ns))
      fields += "type" -> JString(star("enum", e.nullable))
      fields += "symbols" -> JArray(e.symbols.map(JString))
      if (!forFingerprint && e.aliases.nonEmpty)
        fields += "aliases" -> JArray(e.aliases.map(JString))
      extras(s, e.fullName, forFingerprint).foreach(fields += _)
      orderKeys(fields.result(), forFingerprint)
    case r: RecordType =>
      emitted += r.fullName
      val fields = Vector.newBuilder[(String, JValue)]
      fields += "name" -> JString(if (forFingerprint) r.fullName else r.name)
      if (!forFingerprint) r.namespace.foreach(ns =>
        fields += "namespace" -> JString(ns))
      fields += "type" -> JString(star("record", r.nullable))
      fields += "fields" -> JArray(r.fields.map { f =>
        val fb = Vector.newBuilder[(String, JValue)]
        fb += "name" -> JString(f.name)
        fb += "type" -> render(s, f.tpe, emitted, forFingerprint)
        if (!forFingerprint) {
          f.default.foreach(d => fb += "default" -> d)
          if (f.aliases.nonEmpty)
            fb += "aliases" -> JArray(f.aliases.map(JString))
          if (f.hidden) fb += "hidden" -> JBool(true)
        }
        JObject(fb.result())
      })
      if (!forFingerprint && r.aliases.nonEmpty)
        fields += "aliases" -> JArray(r.aliases.map(JString))
      extras(s, r.fullName, forFingerprint).foreach(fields += _)
      orderKeys(fields.result(), forFingerprint)
  }

  /** Parsing-canonical key order (reference: fingerprint.lua:36–54). */
  private val canonicalOrder =
    Vector("name", "type", "fields", "symbols", "items", "values", "size")

  private def orderKeys(fields: Vector[(String, JValue)],
      forFingerprint: Boolean): JObject = {
    if (!forFingerprint) {
      // export order: name first, then type, then the rest as built
      JObject(fields)
    } else {
      val (known, extra) =
        fields.partition { case (k, _) => canonicalOrder.contains(k) }
      // reference sorts preserved extras (fingerprint.lua table.sort)
      JObject(known.sortBy { case (k, _) => canonicalOrder.indexOf(k) } ++
        extra.sortBy(_._1))
    }
  }
}
