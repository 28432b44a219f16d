package graft.sources

import graft.schema._
import graft.ops.FlattenOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType => SArrayType, BinaryType,
  DataType, MapType => SMapType, NullType, StringType, StructField,
  StructType}

/** JSON object-form ingestion (reference: frontend.lua:857–935 copy_data).
  *
  * The reference accepts unions as SINGLE-KEY objects keyed by the branch
  * tag — `{"int": 42}`, `{"my.Rec": {...}}` — with a bare JSON `null`
  * selecting the null branch (frontend.lua:899–919 get_union_tag_map
  * discriminator). [[fromJson]] parses a JSON string column against an
  * Avro schema in that external form and yields the engine's INTERNAL
  * representation, ready for `FlattenOps`/`Validate`:
  *
  *   - `["null", T]` → plain nullable scalar column
  *   - general unions → `{$type$: branch-index, <tag1>: v1, ...}` struct
  *   - records/arrays/maps recurse; missing record fields take their
  *     schema default (frontend.lua:869–881), or null when the field type
  *     is a union with a null branch
  *   - enums stay strings (flatten performs S2I); bytes/fixed arrive as
  *     JSON strings and are cast to binary (UTF-8)
  *
  * Whole-plan declarative: one `from_json` + a Column tree — no UDFs, so
  * ingestion of a 100 TB JSON corpus is a single codegen'd projection per
  * partition with no shuffle.
  */
object JsonIngest {

  /** Spark type of the *external* (JSON object-form) encoding of `t`. */
  def jsonSparkType(s: AvroSchema, t: AvroType): DataType =
    jsonType(s, s.resolve(t), Map.empty)

  private def jsonType(s: AvroSchema, t: AvroType,
      depth: Map[String, Int]): DataType = s.resolve(t) match {
    case u: UnionType =>
      StructType(u.branches.map(s.resolve)
        .filter(_.typeName != "null")
        .map(b => StructField(ValidateValue.branchTag(s, b),
          jsonType(s, b, depth), nullable = true)))
    case r: RecordType =>
      if (depth.getOrElse(r.fullName, 0) >=
          SchemaConverters.MaxRecursionDepth) NullType
      else {
        val d2 = depth.updated(r.fullName, depth.getOrElse(r.fullName, 0) + 1)
        StructType(r.fields.map(f =>
          StructField(f.name, jsonType(s, s.resolve(f.tpe), d2),
            nullable = true)))
      }
    case a: graft.schema.ArrayType =>
      SArrayType(jsonType(s, s.resolve(a.items), depth), containsNull = true)
    case m: graft.schema.MapType =>
      SMapType(StringType, jsonType(s, s.resolve(m.values), depth),
        valueContainsNull = true)
    case _: EnumType => StringType
    case _: FixedType => StringType
    case PrimitiveType("bytes", _) => StringType
    case p: PrimitiveType => SchemaConverters.toSparkType(s, p)
    case other => SchemaConverters.toSparkType(s, other)
  }

  /** Parse a JSON string column (object-form unions) into the internal
    * representation. The schema root must be a record (the usual document
    * shape; reference test corpus ingests records).
    *
    * NOTE: the returned Column references the parse result once per leaf;
    * `JsonToStructs` is a non-codegen expression, so Catalyst cannot
    * common-subexpression-eliminate the duplicates and the JSON is parsed
    * once PER LEAF. Prefer [[ingest]] on DataFrames — it stages the parse
    * in its own projection (which the optimizer will not inline into a
    * multi-reference consumer), so each row is parsed exactly once.
    */
  def fromJson(s: AvroSchema, json: Column,
      options: Map[String, String] = Map.empty): Column = {
    val rootT = s.resolve(s.root)
    val ext = from_json(json, jsonType(s, rootT, Map.empty), options)
    toInternal(s, rootT, ext, Map.empty)
  }

  /** Single-parse ingestion: adds `as` (internal form) to `df`. The
    * external parse lives in its own projection under a multi-reference
    * consumer, so CollapseProject keeps it materialized once per row —
    * ~N× faster than [[fromJson]] for an N-leaf schema.
    */
  def ingest(df: DataFrame, s: AvroSchema, json: Column, as: String = "r",
      options: Map[String, String] = Map.empty): DataFrame = {
    val rootT = s.resolve(s.root)
    val extName = s"__json_ext_$as"
    df.withColumn(extName,
        from_json(json, jsonType(s, rootT, Map.empty), options))
      .withColumn(as, toInternal(s, rootT, col(extName), Map.empty))
      .drop(extName)
  }

  /** Internal struct field name (dots sanitized — FlattenOps contract). */
  private def bfn(s: AvroSchema, b: AvroType): String =
    SchemaConverters.branchFieldName(s, s.resolve(b))

  /** EXTERNAL JSON key: the raw branch tag — namespaced types keep their
    * dots (`{"my.Rec": ...}`, frontend.lua get_union_tag_map); getField
    * matches struct field names literally, so dotted names are safe.
    */
  private def extBfn(s: AvroSchema, b: AvroType): String =
    ValidateValue.branchTag(s, s.resolve(b))

  /** Render an internal-form value column back to the external JSON
    * object form — the inverse of [[fromJson]]. General unions become
    * single-key objects (`to_json` drops null fields by default, so a
    * struct with only the active branch non-null serializes as
    * `{"<tag>": value}`); a null-branch union renders as JSON null;
    * nullable scalars wrap back into their single-key form; bytes/fixed
    * render as UTF-8 strings (matching the ingest cast). Null record
    * fields are ABSENT in the output, mirroring ingestion's
    * absent-means-null convention.
    */
  def toJsonString(s: AvroSchema, value: Column): Column =
    to_json(toExternal(s, s.resolve(s.root), value, Map.empty))

  private def toExternal(s: AvroSchema, t: AvroType, v: Column,
      depth: Map[String, Int]): Column = s.resolve(t) match {
    case u: UnionType if u.isNullableScalar =>
      val nb = u.branches.map(s.resolve).find(_.typeName != "null").get
      when(v.isNull, lit(null))
        .otherwise(struct(toExternal(s, nb, v, depth).as(extBfn(s, nb))))
    case u: UnionType =>
      val resolved = u.branches.map(s.resolve)
      val nonNull = resolved.zipWithIndex.filter(_._1.typeName != "null")
      val tag = v.getField("$type$")
      val fields = nonNull.map { case (b, i) =>
        when(tag === i, toExternal(s, b, v.getField(bfn(s, b)), depth))
          .as(extBfn(s, b))
      }
      val nullIdx = resolved.indexWhere(_.typeName == "null")
      val active = struct(fields: _*)
      if (nullIdx >= 0)
        when(v.isNull || tag === nullIdx, lit(null)).otherwise(active)
      else when(v.isNull, lit(null)).otherwise(active)
    case r: RecordType =>
      if (depth.getOrElse(r.fullName, 0) >=
          SchemaConverters.MaxRecursionDepth) lit(null)
      else {
        val d2 = depth.updated(r.fullName, depth.getOrElse(r.fullName, 0) + 1)
        when(v.isNull, lit(null)).otherwise(struct(r.fields.map { f =>
          toExternal(s, s.resolve(f.tpe), v.getField(f.name), d2)
            .as(f.name)
        }: _*))
      }
    case a: graft.schema.ArrayType =>
      transform(v, e => toExternal(s, a.items, e, depth))
    case m: graft.schema.MapType =>
      transform_values(v, (_, x) => toExternal(s, m.values, x, depth))
    case _: FixedType => v.cast("string")
    case PrimitiveType("bytes", _) => v.cast("string")
    case _ => v
  }

  private def toInternal(s: AvroSchema, t: AvroType, ext: Column,
      depth: Map[String, Int]): Column = s.resolve(t) match {
    case u: UnionType if u.isNullableScalar =>
      val nb = u.branches.map(s.resolve).find(_.typeName != "null").get
      toInternal(s, nb, ext.getField(extBfn(s, nb)), depth)

    case u: UnionType =>
      val resolved = u.branches.map(s.resolve)
      val nonNull = resolved.zipWithIndex.filter(_._1.typeName != "null")
      val nullIdx = resolved.indexWhere(_.typeName == "null")
      val fields = nonNull.map { case (b, _) =>
        toInternal(s, b, ext.getField(extBfn(s, b)), depth).as(bfn(s, b))
      }
      // first present (non-null) branch field wins — the single-key
      // contract means at most one is ever set (frontend.lua:906–918)
      val tag = nonNull.tail
        .foldLeft(when(ext.getField(extBfn(s, nonNull.head._1)).isNotNull,
          lit(nonNull.head._2))) { case (acc, (b, i)) =>
          acc.when(ext.getField(extBfn(s, b)).isNotNull, lit(i))
        }.otherwise(lit(math.max(nullIdx, 0)))
      val st = struct((tag.cast("int").as("$type$") +: fields): _*)
      // JSON null → null branch when the union has one (all getFields on a
      // null struct are null, so `st` itself already encodes it); unions
      // without a null branch yield a null struct for invalid null input
      if (nullIdx >= 0) st else when(ext.isNull, lit(null)).otherwise(st)

    case r: RecordType =>
      if (depth.getOrElse(r.fullName, 0) >=
          SchemaConverters.MaxRecursionDepth)
        lit(null).cast(SchemaConverters.toSparkType(s, r))
      else {
        val d2 = depth.updated(r.fullName, depth.getOrElse(r.fullName, 0) + 1)
        val st = struct(r.fields.map { f =>
          val ft = s.resolve(f.tpe)
          val v = toInternal(s, ft, ext.getField(f.name), d2)
          // missing field → schema default (frontend.lua:869–881).
          // Enums default to the SYMBOL string here — the JSON-internal
          // form keeps enums as strings (flatten does S2I later), while
          // literalFor renders the flat integer index.
          val filled = (f.default, ft) match {
            case (Some(JString(sym)), _: EnumType) =>
              coalesce(v, lit(sym))
            case (Some(d), _) if d != JNull =>
              coalesce(v, FlattenOps.literalFor(s, ft, d))
            case _ => v
          }
          filled.as(f.name)
        }: _*)
        when(ext.isNull, lit(null)).otherwise(st)
      }

    case a: graft.schema.ArrayType =>
      transform(ext, e => toInternal(s, a.items, e, depth))
    case m: graft.schema.MapType =>
      transform_values(ext, (_, v) => toInternal(s, m.values, v, depth))
    case _: EnumType => ext
    case _: FixedType => ext.cast(BinaryType)
    case PrimitiveType("bytes", _) => ext.cast(BinaryType)
    case _ => ext
  }
}
