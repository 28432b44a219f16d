package graft.schema

import org.apache.spark.sql.types._

/** AvroType ⇄ Catalyst [[StructType]] conversion.
  *
  * Catalyst cannot carry enum symbol lists, fixed sizes, union shapes or
  * namespaces, so those travel in field [[Metadata]] under `graft.*` keys;
  * the AvroType AST remains the source of truth (SURVEY §1.3).
  *
  * Representation choices (object form):
  *  - nullable-`*`            → `StructField.nullable`
  *  - enum                    → `StringType` + `graft.enum.symbols`
  *  - fixed                   → `BinaryType` + `graft.fixed.size`
  *  - `["null", T]` union     → nullable T column (Spark-native null)
  *  - general union           → struct with `$type$: int` discriminator and
  *                              one nullable field per non-null branch,
  *                              field name = branch tag
  */
object SchemaConverters {

  val TypeKey = "graft.$type$"

  /** Recursive schemas (legal through union/array/map indirection —
    * reference: test/ddt_suite/recursive.lua) cannot become an infinite
    * static type: named types are expanded at most this many times along
    * one path, deeper levels truncate to a null column (SURVEY §7.3;
    * the record-at-a-time [[graft.ops.ConvertValue]] path has no such
    * limit — recursion there follows the data).
    */
  val MaxRecursionDepth = 5

  def toSparkType(s: AvroSchema, t: AvroType): DataType =
    toSparkType(s, t, Map.empty)

  def toSparkType(s: AvroSchema, t: AvroType,
      depth: Map[String, Int]): DataType =
    s.resolve(t) match {
      case PrimitiveType("null", _) => NullType
      case PrimitiveType("boolean", _) => BooleanType
      case PrimitiveType("int", _) => IntegerType
      case PrimitiveType("long", _) => LongType
      case PrimitiveType("float", _) => FloatType
      case PrimitiveType("double", _) => DoubleType
      case PrimitiveType("bytes", _) => BinaryType
      case PrimitiveType("string", _) => StringType
      case PrimitiveType("any", _) => StringType // opaque JSON carrier
      case _: FixedType => BinaryType
      case _: EnumType => StringType
      case a: graft.schema.ArrayType =>
        val et = s.resolve(a.items)
        org.apache.spark.sql.types.ArrayType(toSparkType(s, et, depth),
          containsNull = isNullish(s, et))
      case m: graft.schema.MapType =>
        val vt = s.resolve(m.values)
        org.apache.spark.sql.types.MapType(StringType,
          toSparkType(s, vt, depth), valueContainsNull = isNullish(s, vt))
      case r: RecordType =>
        if (depth.getOrElse(r.fullName, 0) >= MaxRecursionDepth) NullType
        else toStructType(s, r,
          depth.updated(r.fullName, depth.getOrElse(r.fullName, 0) + 1))
      case u: UnionType if u.isNullableScalar =>
        toSparkType(s, u.branches.find(_.typeName != "null").get, depth)
      case u: UnionType => unionStruct(s, u, depth)
      case ref: Reference => toSparkType(s, ref, depth) // post-resolve
    }

  def isNullish(s: AvroSchema, t: AvroType): Boolean = s.resolve(t) match {
    case PrimitiveType("null", _) => true
    case u: UnionType => u.branches.exists(_.typeName == "null")
    case other => other.nullable
  }

  def toStructType(s: AvroSchema, r: RecordType): StructType =
    toStructType(s, r, Map(r.fullName -> 1))

  def toStructType(s: AvroSchema, r: RecordType,
      depth: Map[String, Int]): StructType =
    StructType(r.fields.map { f =>
      val ft = s.resolve(f.tpe)
      StructField(f.name, toSparkType(s, ft, depth),
        nullable = isNullish(s, ft) || f.default.contains(JNull),
        metadata = fieldMetadata(s, ft, f))
    })

  /** Branch tag used as the struct field name for general unions
    * (reference: frontend.lua:899–919 single-key-map discriminator).
    */
  def branchFieldName(s: AvroSchema, b: AvroType): String =
    ValidateValue.branchTag(s, b).replace('.', '_')

  def unionStruct(s: AvroSchema, u: UnionType): StructType =
    unionStruct(s, u, Map.empty)

  def unionStruct(s: AvroSchema, u: UnionType,
      depth: Map[String, Int]): StructType = {
    val valueFields = u.branches.zipWithIndex.collect {
      case (b, i) if s.resolve(b).typeName != "null" =>
        StructField(branchFieldName(s, b),
          toSparkType(s, s.resolve(b), depth), nullable = true)
    }
    StructType(StructField("$type$", IntegerType, nullable = false) +:
      valueFields)
  }

  private def fieldMetadata(s: AvroSchema, ft: AvroType,
      f: Field): Metadata = {
    val b = new MetadataBuilder()
    s.resolve(ft) match {
      case e: EnumType =>
        b.putStringArray("graft.enum.symbols", e.symbols.toArray)
      case fx: FixedType => b.putLong("graft.fixed.size", fx.size.toLong)
      case _ => ()
    }
    if (f.hidden) b.putBoolean("graft.hidden", true)
    b.build()
  }
}
