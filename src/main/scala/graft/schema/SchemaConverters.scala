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

  def toSparkType(s: AvroSchema, t: AvroType): DataType =
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
        org.apache.spark.sql.types.ArrayType(toSparkType(s, et),
          containsNull = isNullish(s, et))
      case m: graft.schema.MapType =>
        val vt = s.resolve(m.values)
        org.apache.spark.sql.types.MapType(StringType, toSparkType(s, vt),
          valueContainsNull = isNullish(s, vt))
      case r: RecordType => toStructType(s, r)
      case u: UnionType if u.isNullableScalar =>
        toSparkType(s, u.branches.find(_.typeName != "null").get)
      case u: UnionType => unionStruct(s, u)
      case ref: Reference => toSparkType(s, ref) // unreachable post-resolve
    }

  def isNullish(s: AvroSchema, t: AvroType): Boolean = s.resolve(t) match {
    case PrimitiveType("null", _) => true
    case u: UnionType => u.branches.exists(_.typeName == "null")
    case other => other.nullable
  }

  def toStructType(s: AvroSchema, r: RecordType): StructType =
    StructType(r.fields.map { f =>
      val ft = s.resolve(f.tpe)
      StructField(f.name, toSparkType(s, ft),
        nullable = isNullish(s, ft) || f.default.contains(JNull),
        metadata = fieldMetadata(s, ft, f))
    })

  /** Branch tag used as the struct field name for general unions
    * (reference: frontend.lua:899–919 single-key-map discriminator).
    */
  def branchFieldName(s: AvroSchema, b: AvroType): String =
    ValidateValue.branchTag(s, b).replace('.', '_')

  def unionStruct(s: AvroSchema, u: UnionType): StructType = {
    val valueFields = u.branches.zipWithIndex.collect {
      case (b, i) if s.resolve(b).typeName != "null" =>
        StructField(branchFieldName(s, b), toSparkType(s, s.resolve(b)),
          nullable = true)
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
