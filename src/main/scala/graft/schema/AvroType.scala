package graft.schema

import scala.collection.mutable

/** Schema-definition error with a `path/to/site: message` rendering matching
  * the reference contract (reference: avro_schema/frontend.lua error paths,
  * test/ddt_suite/invalid.lua goldens).
  */
final class AvroSchemaError(val fullMessage: String)
    extends RuntimeException(fullMessage)

/** The Avro type AST. Mirrors the reference's normalized schema AST
  * (reference: frontend.lua:254–671 copy_schema) including the nullable-`*`
  * extension (frontend.lua:81–88), which maps 1:1 onto Spark's
  * `StructField.nullable`.
  *
  * Named types are referenced through [[Reference]] nodes resolved via the
  * owning [[AvroSchema]]'s type registry — this keeps the AST immutable while
  * still permitting recursive schemas (reference: frontend.lua:323–389).
  */
sealed trait AvroType {
  def nullable: Boolean
  /** Bare type name without the nullable marker: "int", "record", … */
  def typeName: String
  def withNullable(n: Boolean): AvroType
  /** Rendered name: `typeName` plus `*` when nullable. */
  def displayName: String = if (nullable) typeName + "*" else typeName
}

object AvroPrimitives {
  val names: Set[String] =
    Set("null", "boolean", "int", "long", "float", "double", "bytes",
        "string", "any")
  /** Legal promotions writer→reader (reference: frontend.lua:54–60). */
  val promotions: Map[String, Set[String]] = Map(
    "int" -> Set("long", "float", "double"),
    "long" -> Set("float", "double"),
    "float" -> Set("double"),
    "string" -> Set("bytes"),
    "bytes" -> Set("string"))
}

final case class PrimitiveType(typeName: String, nullable: Boolean = false)
    extends AvroType {
  require(AvroPrimitives.names(typeName), s"not a primitive: $typeName")
  def withNullable(n: Boolean): PrimitiveType = copy(nullable = n)
}

object PrimitiveType {
  val NullType = PrimitiveType("null")
  val BooleanType = PrimitiveType("boolean")
  val IntType = PrimitiveType("int")
  val LongType = PrimitiveType("long")
  val FloatType = PrimitiveType("float")
  val DoubleType = PrimitiveType("double")
  val BytesType = PrimitiveType("bytes")
  val StringType = PrimitiveType("string")
  val AnyType = PrimitiveType("any")
}

/** Record field (reference: frontend.lua:392–440). `default` keeps the raw
  * JSON default; `hidden` fields occupy tuple slots but are dropped by
  * unflatten (reference: frontend.lua:437, compiler.lua:783–799).
  */
final case class Field(
    name: String,
    tpe: AvroType,
    default: Option[JValue] = None,
    aliases: Vector[String] = Vector.empty,
    hidden: Boolean = false)

sealed trait NamedType extends AvroType {
  def name: String
  def namespace: Option[String]
  def aliases: Vector[String]
  def fullName: String = namespace.fold(name)(ns => s"$ns.$name")
}

final case class RecordType(
    name: String,
    namespace: Option[String],
    fields: Vector[Field],
    aliases: Vector[String] = Vector.empty,
    nullable: Boolean = false) extends NamedType {
  def typeName = "record"
  def withNullable(n: Boolean): RecordType = copy(nullable = n)
  def fieldIndex(fname: String): Option[Int] = {
    val i = fields.indexWhere(_.name == fname)
    if (i >= 0) Some(i) else None
  }
}

final case class EnumType(
    name: String,
    namespace: Option[String],
    symbols: Vector[String],
    aliases: Vector[String] = Vector.empty,
    nullable: Boolean = false) extends NamedType {
  def typeName = "enum"
  def withNullable(n: Boolean): EnumType = copy(nullable = n)
  lazy val symbolIndex: Map[String, Int] = symbols.zipWithIndex.toMap
}

final case class FixedType(
    name: String,
    namespace: Option[String],
    size: Int,
    aliases: Vector[String] = Vector.empty,
    nullable: Boolean = false) extends NamedType {
  def typeName = "fixed"
  def withNullable(n: Boolean): FixedType = copy(nullable = n)
}

final case class ArrayType(items: AvroType, nullable: Boolean = false)
    extends AvroType {
  def typeName = "array"
  def withNullable(n: Boolean): ArrayType = copy(nullable = n)
}

final case class MapType(values: AvroType, nullable: Boolean = false)
    extends AvroType {
  def typeName = "map"
  def withNullable(n: Boolean): MapType = copy(nullable = n)
}

/** Union — never itself nullable (spelled as a JSON array; the `*` extension
  * applies to type-name strings only).
  */
final case class UnionType(branches: Vector[AvroType]) extends AvroType {
  def nullable = false
  def typeName = "union"
  def withNullable(n: Boolean): UnionType = this
  def isNullableScalar: Boolean = branches.length == 2 &&
    branches.exists(_.typeName == "null")
}

/** Use of a named type by name. `nullable` belongs to the *use site*
  * (reference keeps nullable/non-nullable twins per name —
  * frontend.lua:116–162); resolution happens through [[AvroSchema.resolve]].
  */
final case class Reference(fullName: String, nullable: Boolean = false)
    extends AvroType {
  def typeName = "reference"
  def withNullable(n: Boolean): Reference = copy(nullable = n)
}

final case class CreateOptions(
    preserveInAst: Seq[String] = Nil,
    preserveInFingerprint: Seq[String] = Nil,
    utf8Enums: Boolean = false,
    forwardReference: Boolean = false,
    autoDefaults: Boolean = false)

/** A parsed, validated, normalized schema — the analog of the reference's
  * opaque schema handle (reference: init.lua:24–34, 153–171).
  */
final class AvroSchema private[schema] (
    val root: AvroType,
    val types: Map[String, NamedType],
    val options: CreateOptions,
    /** Extra attributes kept by `preserve_in_ast`, keyed by type full name
      * (reference: init.lua:123–151, frontend.lua:223–228).
      */
    val preserved: Map[String, Vector[(String, JValue)]] = Map.empty) {

  /** Resolve references; the returned node carries the use-site nullability. */
  def resolve(t: AvroType): AvroType = t match {
    case Reference(fn, n) =>
      val node = types.getOrElse(fn,
        throw new AvroSchemaError(s"Unknown Avro type: $fn"))
      if (node.nullable == n) node else node.withNullable(n)
    case other => other
  }

  def rootRecord: RecordType = resolve(root) match {
    case r: RecordType if !r.nullable => r
    case other => throw new AvroSchemaError(
      s"Expected a non-nullable record at the top level, got ${other.displayName}")
  }

  /** Flat-order dotted leaf paths (reference: frontend.lua:1381–1405).
    * Unions contribute `x.$type$` + `x`; nullable records, arrays, maps and
    * fixeds are single slots.
    */
  def getNames(serviceFields: Seq[String] = Nil): Vector[String] = {
    val out = Vector.newBuilder[String]
    serviceFields.foreach(_ => out += "$service_field$")
    def walk(rec: RecordType, prefix: List[String]): Unit =
      rec.fields.foreach { f =>
        val path = (f.name :: prefix).reverse.mkString(".")
        resolve(f.tpe) match {
          case r: RecordType if !r.nullable => walk(r, f.name :: prefix)
          case _: UnionType => out += s"$path.$$type$$"; out += path
          case _ => out += path
        }
      }
    walk(rootRecord, Nil)
    out.result()
  }

  /** Flat-order leaf type names (reference: frontend.lua:1407–1432). */
  def getTypes(serviceFields: Seq[String] = Nil): Vector[String] = {
    val out = Vector.newBuilder[String]
    serviceFields.foreach(out += _)
    def walk(rec: RecordType): Unit =
      rec.fields.foreach { f =>
        resolve(f.tpe) match {
          case r: RecordType if !r.nullable => walk(r)
          case _: UnionType => out += "union_type"; out += "union_value"
          case other => out += other.displayName
        }
      }
    walk(rootRecord)
    out.result()
  }

  /** A handle rooted at a subtree (e.g. one field's type), sharing this
    * schema's named-type registry.
    */
  def subSchema(t: AvroType): AvroSchema =
    new AvroSchema(t, types, options, preserved)

  def exportJson: JValue = SchemaIO.exportSchema(this)
  def exportString: String = exportJson.render

  def fingerprint(algorithm: String = "SHA-256", size: Int = 8): Array[Byte] =
    SchemaIO.fingerprint(this, algorithm, size)

  override def toString: String = s"AvroSchema(${resolve(root).displayName})"
}

/** Public API facade — the analog of the reference's module export table
  * (reference: init.lua:524–534).
  */
object Avro {
  def create(json: String): AvroSchema = create(json, CreateOptions())
  def create(json: String, options: CreateOptions): AvroSchema = {
    val j = try Json.parse(json) catch {
      case e: Exception =>
        throw new AvroSchemaError(s"Invalid JSON: ${e.getMessage}")
    }
    createFromJValue(j, options)
  }
  def createFromJValue(j: JValue,
      options: CreateOptions = CreateOptions()): AvroSchema =
    new SchemaParser(options).parse(j)

  def isSchema(x: Any): Boolean = x.isInstanceOf[AvroSchema]

  def areCompatible(writer: AvroSchema, reader: AvroSchema,
      downgrade: Boolean = false): Either[String, Unit] =
    Compat.resolve(writer, reader, downgrade).map(_ => ())

  def getNames(s: AvroSchema, serviceFields: Seq[String] = Nil): Vector[String] =
    s.getNames(serviceFields)
  def getTypes(s: AvroSchema, serviceFields: Seq[String] = Nil): Vector[String] =
    s.getTypes(serviceFields)
  def export(s: AvroSchema): String = s.exportString
  def fingerprint(s: AvroSchema, algorithm: String = "SHA-256",
      size: Int = 8): Array[Byte] = s.fingerprint(algorithm, size)
  def fingerprintHex(s: AvroSchema, algorithm: String = "SHA-256",
      size: Int = 8): String =
    s.fingerprint(algorithm, size).map(b => f"${b & 0xff}%02x").mkString
}

/** Recursive-descent schema parser with the reference's validation and error
  * contract (reference: frontend.lua:254–671; goldens:
  * test/ddt_suite/invalid.lua).
  */
private[schema] final class SchemaParser(options: CreateOptions) {
  private val scope = mutable.LinkedHashMap.empty[String, NamedType]
  private val aliasOf = mutable.Map.empty[String, String] // alias -> canonical
  private val pending = mutable.Set.empty[String] // open named definitions
  private val path = mutable.ArrayBuffer.empty[String]
  // (recordFullName, fieldPath) frames for direct-containment detection
  private val openRecordFrames = mutable.ArrayBuffer.empty[(String, List[String])]
  private val forwardRefs = mutable.Map.empty[String, String] // name -> path
  private val preserved =
    mutable.Map.empty[String, Vector[(String, JValue)]]
  private val deferredDefaults =
    mutable.ArrayBuffer.empty[(String, Field, RecordType)]

  private def err(msg: String): Nothing = {
    val p = path.mkString("/")
    throw new AvroSchemaError(if (p.isEmpty) msg else s"$p: $msg")
  }

  private def frame[A](name: String)(body: => A): A = {
    path += name
    try body finally path.remove(path.length - 1)
  }
  private def renameFrame(name: String): Unit =
    path(path.length - 1) = name

  private val nameRe = "[A-Za-z_][A-Za-z0-9_]*".r
  private def isValidName(s: String): Boolean = nameRe.matches(s)

  private def jsonScalarText(j: JValue): String = j match {
    case JString(s) => s
    case JLong(n) => n.toString
    case JDouble(d) => if (d.isWhole) d.toLong.toString else d.toString
    case JBool(b) => b.toString
    case JNull => "nil"
    case _: JArray => "<array>"
    case _: JObject => "<object>"
  }

  def parse(j: JValue): AvroSchema = {
    val root = copySchema(j, insideUnion = false)
    // forward references must all be defined by now
    forwardRefs.foreach { case (name, p) =>
      if (!scope.contains(name))
        throw new AvroSchemaError(
          if (p.isEmpty) s"Unknown Avro type: $name"
          else s"$p: Unknown Avro type: $name")
    }
    val types = scope.toMap
    if (!options.preserveInFingerprint.forall(options.preserveInAst.contains))
      throw new AvroSchemaError(
        "preserve_in_fingerprint must be a subset of preserve_in_ast")
    val schema = new AvroSchema(root, types, options, preserved.toMap)
    // deferred default validation (reference: frontend.lua:660–668)
    deferredDefaults.foreach { case (fpath, field, _) =>
      field.default.foreach { d =>
        ValidateValue.validateDefault(schema, field.tpe, d) match {
          case Left(e) =>
            throw new AvroSchemaError(
              if (fpath.isEmpty) s"Default value not valid ($e)"
              else s"$fpath: Default value not valid ($e)")
          case Right(_) => ()
        }
      }
    }
    if (options.autoDefaults) new AvroSchema(root,
      augmentDefaults(schema), options, preserved.toMap)
    else schema
  }

  /** Fill zero-value defaults for fields lacking one
    * (reference: init.lua:77–121 augment_defaults).
    */
  private def augmentDefaults(schema: AvroSchema): Map[String, NamedType] = {
    def zero(t: AvroType): Option[JValue] = schema.resolve(t) match {
      case PrimitiveType("boolean", _) => Some(JBool(false))
      case PrimitiveType("int" | "long", _) => Some(JLong(0))
      case PrimitiveType("float" | "double", _) => Some(JLong(0))
      case PrimitiveType("bytes" | "string", _) => Some(JString(""))
      case _: ArrayType => Some(JArray(Vector.empty))
      case _: MapType => Some(JObject(Vector.empty))
      case e: EnumType => Some(JString(e.symbols.head))
      case r: RecordType =>
        val fs = r.fields.map(f =>
          f.name -> f.default.orElse(zero(f.tpe)).getOrElse(JNull))
        Some(JObject(fs))
      case u: UnionType => zero(u.branches.head)
      case _ => None
    }
    // memoize per fullName so alias scope keys (same instance, visited
    // later) get the SAME augmented record, not the pre-augment one
    val rewritten = mutable.Map.empty[String, NamedType]
    def rewrite(t: NamedType): NamedType = t match {
      case r: RecordType =>
        rewritten.getOrElseUpdate(r.fullName,
          r.copy(fields = r.fields.map { f =>
            if (f.default.isDefined) f else f.copy(default = zero(f.tpe))
          }))
      case other => other
    }
    scope.map { case (k, v) => k -> rewrite(v) }.toMap
  }

  private def registerName(fullName: String): Unit = {
    if (scope.contains(fullName) || pending.contains(fullName) ||
        aliasOf.contains(fullName))
      err(s"Type name already defined: $fullName")
    pending += fullName
  }

  private def registerAlias(alias: String, of: String): Unit = {
    if (scope.contains(alias) || pending.contains(alias) ||
        aliasOf.contains(alias))
      err(s"Alias type name already defined: $alias")
    aliasOf(alias) = of
  }

  private val knownTypeKeys = Set("type", "name", "namespace", "fields",
    "symbols", "items", "values", "size", "aliases", "default", "hidden")

  /** Keep user extension attributes listed in preserve_in_ast. */
  private def collectPreserved(obj: JObject, fullName: String): Unit = {
    if (options.preserveInAst.nonEmpty) {
      val extras = obj.fields.filter { case (k, _) =>
        !knownTypeKeys(k) && options.preserveInAst.contains(k) }
      if (extras.nonEmpty) preserved(fullName) = extras
    }
  }

  private def finishNamed(t: NamedType): Unit = {
    pending -= t.fullName
    scope(t.fullName) = t
    t.aliases.foreach { a =>
      val fq = if (a.contains('.')) a
        else t.namespace.fold(a)(ns => s"$ns.$a")
      scope.getOrElseUpdate(fq, t)
    }
  }

  /** Strip a trailing `*`; returns (name, nullable)
    * (reference: frontend.lua:81–88 extract_nullable).
    */
  private def extractNullable(s: String): (String, Boolean) =
    if (s.nonEmpty && s.endsWith("*")) (s.dropRight(1), true) else (s, false)

  private var currentNamespace: Option[String] = None

  private def qualify(name: String): String =
    if (name.contains('.')) name
    else currentNamespace.fold(name)(ns => s"$ns.$name")

  private def lookupName(name: String): Option[String] = {
    val q = qualify(name)
    def canon(n: String): Option[String] =
      if (scope.contains(n) || pending.contains(n)) Some(n)
      else aliasOf.get(n)
    canon(q).orElse(if (q != name) canon(name) else None)
  }

  private def copySchema(j: JValue, insideUnion: Boolean): AvroType = j match {
    case JString(s) => typeFromName(s, insideUnion)
    case JArray(branches) =>
      if (insideUnion) err("Union may not immediately contain other unions")
      parseUnion(branches)
    case obj: JObject =>
      obj.get("type") match {
        case None => err("Must have a \"type\"")
        case Some(JString(t)) => parseComplex(t, obj, insideUnion)
        case Some(nested @ (_: JObject | _: JArray)) =>
          copySchema(nested, insideUnion)
        case Some(other) => err(s"Unknown Avro type: ${jsonScalarText(other)}")
      }
    case other => err(s"Unknown Avro type: ${jsonScalarText(other)}")
  }

  private def typeFromName(s: String, insideUnion: Boolean): AvroType = {
    val (base, nullable) = extractNullable(s)
    if (AvroPrimitives.names(base)) {
      if (base == "null" && nullable) err(s"Unknown Avro type: $s")
      PrimitiveType(base, nullable)
    } else if (!isValidName(base) && !base.split('.').forall(isValidName)) {
      err(s"Unknown Avro type: $s")
    } else lookupName(base) match {
      case Some(canonical) =>
        checkContainment(canonical)
        Reference(canonical, nullable)
      case None if options.forwardReference =>
        val q = qualify(base)
        forwardRefs.getOrElseUpdate(q, path.mkString("/"))
        Reference(q, nullable)
      case None =>
        // report the name as resolved in the current namespace
        // (reference fullname(), frontend.lua:72-77)
        err(s"Unknown Avro type: ${qualify(base)}")
    }
  }

  /** A record may not (transitively) contain itself through plain record
    * fields — recursion must pass a union/array/map indirection
    * (reference: frontend.lua:323–389; golden: `Record FooBar contains
    * itself via B/X/Y`).
    */
  private def checkContainment(fullName: String): Unit = {
    val idx = openRecordFrames.indexWhere(_._1 == fullName)
    if (idx >= 0) {
      val viaPath = openRecordFrames.drop(idx)
        .flatMap(_._2.headOption).mkString("/")
      throw new AvroSchemaError(
        s"Record $fullName contains itself via $viaPath")
    }
  }

  /** union/array/map indirection legalizes recursion: anything below it can
    * no longer "directly contain" the currently-open records.
    */
  private def indirection[A](body: => A): A = {
    val saved = openRecordFrames.toVector
    openRecordFrames.clear()
    try body finally {
      openRecordFrames.clear()
      openRecordFrames ++= saved
    }
  }

  private def parseUnion(branches: Vector[JValue]): UnionType = {
    if (branches.isEmpty) err("Union type must have at least one branch")
    frame("<union>")(parseUnionBranches(branches))
  }

  private def parseUnionBranches(branches: Vector[JValue]): UnionType = {
    val tags = mutable.Set.empty[String]
    val parsed = branches.zipWithIndex.map { case (b, i) =>
      frame(s"<branch-${i + 1}>") {
        val t = indirection { copySchema(b, insideUnion = true) }
        val tag = t match {
          case Reference(fn, _) => fn
          case other => other.typeName
        }
        if (!tags.add(tag)) err(s"Union contains $tag twice")
        t
      }
    }
    UnionType(parsed)
  }

  private def parseComplex(typeStr: String, obj: JObject,
      insideUnion: Boolean): AvroType = {
    val (base, nullable) = extractNullable(typeStr)
    base match {
      case "record" => parseRecord(obj, nullable)
      case "enum" => parseEnum(obj, nullable)
      case "fixed" => parseFixed(obj, nullable)
      case "array" => frame("<array>") {
        val items = obj.get("items").getOrElse(
          err("Array type must have \"items\""))
        ArrayType(indirection { copySchema(items, insideUnion = false) },
          nullable)
      }
      case "map" => frame("<map>") {
        val values = obj.get("values").getOrElse(
          err("Map type must have \"values\""))
        MapType(indirection { copySchema(values, insideUnion = false) },
          nullable)
      }
      case p if AvroPrimitives.names(p) =>
        // {"type":"int"} normalizes to "int" (reference: frontend.lua:308–316)
        PrimitiveType(p, nullable)
      case other =>
        // maybe a named reference in object form
        typeFromName(typeStr, insideUnion)
    }
  }

  private def parseTypeName(obj: JObject, kind: String): (String, Option[String]) =
    obj.get("name") match {
      case None => err("Must have a \"name\"")
      case Some(JString(n)) =>
        val segments = n.split('.')
        if (!segments.forall(isValidName) || n.endsWith(".") || n.isEmpty)
          err(s"Bad type name: $n")
        val explicitNs = obj.get("namespace") match {
          case Some(JString(ns)) =>
            if (!ns.split('.').forall(isValidName)) err(s"Bad namespace: $ns")
            Some(ns)
          case _ => None
        }
        if (n.contains('.'))
          (segments.last, Some(segments.init.mkString(".")))
        else
          (n, explicitNs.orElse(currentNamespace))
      case Some(other) => err(s"Bad type name: ${jsonScalarText(other)}")
    }

  private def parseAliases(obj: JObject): Vector[String] =
    obj.get("aliases") match {
      case None => Vector.empty
      case Some(JArray(items)) => items.map {
        case JString(a) if a.split('.').forall(isValidName) && a.nonEmpty => a
        case other => err(s"Bad type name: ${jsonScalarText(other)}")
      }
      case Some(_) => err("Property \"aliases\" must be a list")
    }

  private def parseRecord(obj: JObject, nullable: Boolean): AvroType =
    frame("<record>") {
      val (name, ns) = parseTypeName(obj, "record")
      val fullName = ns.fold(name)(n => s"$n.$name")
      renameFrame(fullName) // error paths carry the namespaced name
      registerName(fullName)
      collectPreserved(obj, fullName)
      val savedNs = currentNamespace
      currentNamespace = ns
      openRecordFrames += ((fullName, Nil))
      try {
        val aliases = parseAliases(obj)
        aliases.foreach { a =>
          val fq = if (a.contains('.')) a else ns.fold(a)(n => s"$n.$a")
          registerAlias(fq, fullName)
        }
        val fieldsJ = obj.get("fields") match {
          case None => err("Record type must have \"fields\"")
          case Some(JArray(fs)) => fs
          case Some(_) => err("Record \"fields\" must be a list")
        }
        if (fieldsJ.isEmpty) err("Record type must have at least one field")
        val fieldNames = mutable.Set.empty[String]
        val fields = fieldsJ.zipWithIndex.map { case (fj, i) =>
          frame(s"<field-${i + 1}>") {
            val fo = fj match {
              case o: JObject => o
              case _ => err("Record field must be a list")
            }
            val fname = fo.get("name") match {
              case None => err("Record field must have a \"name\"")
              case Some(JString(n)) if isValidName(n) => n
              case Some(other) =>
                err(s"Bad record field name: ${jsonScalarText(other)}")
            }
            if (!fieldNames.add(fname))
              err(s"Record contains field $fname twice")
            renameFrame(fname)
            val last = openRecordFrames.length - 1
            openRecordFrames(last) = (fullName, fname :: Nil)
            val ftype = fo.get("type") match {
              case None => err("Record field must have a \"type\"")
              case Some(tj) => copySchema(tj, insideUnion = false)
            }
            val fAliases = fo.get("aliases") match {
              case None => Vector.empty
              case Some(JArray(items)) => items.map {
                case JString(a) if isValidName(a) => a
                case other =>
                  err(s"Bad field alias name: ${jsonScalarText(other)}")
              }
              case Some(_) => err("Property \"aliases\" must be a list")
            }
            fAliases.foreach { a =>
              if (!fieldNames.add(a))
                err(s"Alias field name already defined: $a")
            }
            val hidden = fo.get("hidden") match {
              case Some(JBool(b)) => b
              case Some(JNull) | None => false
              case Some(_) => true
            }
            Field(fname, ftype, fo.get("default"), fAliases, hidden)
          }
        }
        val rec = RecordType(name, ns, fields, aliases, nullable)
        finishNamed(rec)
        val fpath = path.mkString("/")
        fields.foreach(f => deferredDefaults += ((s"$fullName/${f.name}", f, rec)))
        Reference(fullName, nullable)
      } finally {
        currentNamespace = savedNs
        openRecordFrames.remove(openRecordFrames.length - 1)
        pending -= fullName
      }
    }

  private def parseEnum(obj: JObject, nullable: Boolean): AvroType =
    frame("<enum>") {
      val (name, ns) = parseTypeName(obj, "enum")
      val fullName = ns.fold(name)(n => s"$n.$name")
      renameFrame(fullName) // error paths carry the namespaced name
      registerName(fullName)
      collectPreserved(obj, fullName)
      try {
        val aliases = parseAliases(obj)
        aliases.foreach { a =>
          val fq = if (a.contains('.')) a else ns.fold(a)(n => s"$n.$a")
          registerAlias(fq, fullName)
        }
        val symbolsJ = obj.get("symbols") match {
          case None => err("Enum type must have \"symbols\"")
          case Some(JArray(ss)) => ss
          case Some(_) => err("Enum \"symbols\" must be a list")
        }
        if (symbolsJ.isEmpty) err("Enum type must contain at least one symbol")
        val seen = mutable.Set.empty[String]
        val symbols = symbolsJ.map {
          case JString(s) if options.utf8Enums || isValidName(s) =>
            if (!seen.add(s)) err(s"Enum contains symbol $s twice")
            s
          case other => err(s"Bad enum symbol name: ${jsonScalarText(other)}")
        }
        val e = EnumType(name, ns, symbols, aliases, nullable)
        finishNamed(e)
        Reference(fullName, nullable)
      } finally pending -= fullName
    }

  private def parseFixed(obj: JObject, nullable: Boolean): AvroType =
    frame("<fixed>") {
      val (name, ns) = parseTypeName(obj, "fixed")
      val fullName = ns.fold(name)(n => s"$n.$name")
      renameFrame(fullName) // error paths carry the namespaced name
      registerName(fullName)
      collectPreserved(obj, fullName)
      try {
        val aliases = parseAliases(obj)
        aliases.foreach { a =>
          val fq = if (a.contains('.')) a else ns.fold(a)(n => s"$n.$a")
          registerAlias(fq, fullName)
        }
        val size = obj.get("size") match {
          case None => err("Fixed type must have \"size\"")
          case Some(JLong(n)) if n > 0 && n <= Int.MaxValue => n.toInt
          case Some(other) => err(s"Bad fixed type size: ${
            other match {
              case JNull => ""
              case v => jsonScalarText(v)
            }}")
        }
        val f = FixedType(name, ns, size, aliases, nullable)
        finishNamed(f)
        Reference(fullName, nullable)
      } finally pending -= fullName
    }
}
