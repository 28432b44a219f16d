package graft.ops

import graft.schema._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** DataFrame-scale validation: instead of the reference's exception-per-record
  * (reference: frontend.lua:740–938 + runtime.lua:275–336), produce
  * `(valid boolean, error string)` columns so bad rows can be routed to a
  * quarantine sink at 100 TB instead of failing the job (SURVEY §3.3).
  *
  * Error strings keep the reference contract: `path/to/field: message`.
  * At DataFrame level a NULL in a non-nullable slot means the field is
  * missing (Spark rows cannot distinguish absent from null — SURVEY §7.3).
  */
object Validate {

  /** Append `_valid` / `_error` columns to an object-form DataFrame. */
  def apply(schema: AvroSchema, df: DataFrame): DataFrame = {
    val err = errorColumn(schema, name => df(name))
    df.withColumn("_error", err).withColumn("_valid", err.isNull)
  }

  /** Strict variant: run the full [[ValidateValue]] interpreter per row
    * (mapPartitions), producing the reference's exact validate error family
    * (`Not a int: …`, `Field X missing`). Heavier than the expression
    * variant above — use when error-message parity matters more than
    * staying inside codegen. NULL columns are treated as absent
    * (SURVEY §7.3).
    */
  def strict(schema: AvroSchema, df: DataFrame): DataFrame = {
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_valid",
          org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("_error", StringType,
          nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val fieldNames = df.schema.fieldNames.toIndexedSeq
    val schemaJson = schema.exportString
    df.mapPartitions { rows =>
      val s = Avro.create(schemaJson)
      rows.map { r =>
        val data = fieldNames.zipWithIndex.flatMap { case (n, i) =>
          val v = sparkToScala(r.get(i))
          if (v == null) None else Some(n -> v)
        }.toMap
        ValidateValue.validate(s, data) match {
          case Right(_) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(true, null))
          case Left(e) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(false, e))
        }
      }
    }(enc)
  }

  /** Spark external value → the Scala shapes ValidateValue understands. */
  private def sparkToScala(v: Any): Any = v match {
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zipWithIndex.flatMap { case (n, i) =>
        val x = sparkToScala(r.get(i))
        if (x == null) None else Some(n -> x)
      }.toMap
    case s: scala.collection.Seq[_] => s.map(sparkToScala).toVector
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k.toString -> sparkToScala(x) }.toMap
    case other => other
  }

  /** First validation error (schema order) or NULL when the row is valid. */
  def errorColumn(schema: AvroSchema, in: String => Column): Column = {
    val rec = schema.rootRecord
    val errs = rec.fields.flatMap(f =>
      fieldErrors(schema, f, in(f.name), pathPrefix = "", parentPath = ""))
    if (errs.isEmpty) lit(null).cast(StringType) else coalesce(errs: _*)
  }

  private def msg(parentPath: String, m: String): Column =
    lit(if (parentPath.isEmpty) m else s"$parentPath: $m")

  /** Errors of one record field, in declaration order.
    * `pathPrefix` is the field's own path ("a/b"); `parentPath` is the
    * containing record's path (error location for Key missing).
    */
  private def fieldErrors(s: AvroSchema, f: Field, col: Column,
      pathPrefix: String, parentPath: String, depth: Int = 0): Seq[Column] = {
    val path = if (pathPrefix.isEmpty) f.name else s"$pathPrefix/${f.name}"
    val t = s.resolve(f.tpe)
    val missingOk = t.nullable || f.default.isDefined ||
      (t match {
        case u: UnionType => u.branches.exists(_.typeName == "null")
        case _ => false
      })
    val missing =
      if (missingOk) Nil
      else Seq(when(col.isNull,
        msg(parentPath, s"Key missing: \"${f.name}\"")))
    missing ++ typeErrors(s, t, col, path, depth)
  }

  /** Value-level checks for a (non-missing) value. */
  def typeErrors(s: AvroSchema, t0: AvroType, col: Column,
      path: String): Seq[Column] = typeErrors(s, t0, col, path, 0)

  private def typeErrors(s: AvroSchema, t0: AvroType, col: Column,
      path: String, depth: Int): Seq[Column] = {
    if (depth >= SchemaConverters.MaxRecursionDepth) return Nil
    val t = s.resolve(t0)
    t match {
      case e: EnumType =>
        Seq(when(col.isNotNull &&
          !col.isin(e.symbols.map(x => x: Any): _*),
          concat(lit(s"$path: Bad value: \""), col, lit("\""))))
      case fx: FixedType =>
        Seq(when(col.isNotNull && length(col) =!= fx.size,
          concat(lit(s"$path: Expecting BIN of length ${fx.size}. " +
            "Encountered BIN of length "), length(col), lit("."))))
      case r: RecordType =>
        r.fields.flatMap { f =>
          val inner = col.getField(f.name)
          val guarded = fieldErrors(s, f, inner, path, path, depth + 1)
          // only report inner errors when the struct itself is present
          guarded.map(g => when(col.isNotNull, g))
        }
      case a: ArrayType =>
        val inner = firstElementError(s, a.items, col, path)
        inner.toSeq
      case m: MapType =>
        val inner = firstElementError(s, m.values, map_values(col), path)
        inner.toSeq
      case u: UnionType if !u.isNullableScalar =>
        // struct-form union: tag must be a valid branch index
        val tag = col.getField("$type$")
        Seq(when(col.isNotNull &&
          (tag.isNull || tag < 0 || tag >= u.branches.length),
          concat(lit(s"$path: Bad value: "), coalesce(tag.cast(StringType),
            lit("null")))))
      case _ => Nil
    }
  }

  /** First error among array/map elements, if any. */
  private def firstElementError(s: AvroSchema, elemT: AvroType,
      arr: Column, path: String): Option[Column] = {
    val checks = typeErrors(s, s.resolve(elemT), lit(null), path)
    // only scalar-level element checks are supported (enum/fixed); deeper
    // nesting validates structurally via the schema's Spark type
    s.resolve(elemT) match {
      case e: EnumType =>
        val bad = filter(arr, x => !x.isin(e.symbols.map(v => v: Any): _*))
        Some(when(arr.isNotNull && size(bad) > 0,
          concat(lit(s"$path: Bad value: \""), element_at(bad, 1), lit("\""))))
      case fx: FixedType =>
        val bad = filter(arr, x => length(x) =!= fx.size)
        Some(when(arr.isNotNull && size(bad) > 0,
          concat(lit(s"$path: Expecting BIN of length ${fx.size}. " +
            "Encountered BIN of length "), length(element_at(bad, 1)),
            lit("."))))
      case _ => { val _ = checks; None }
    }
  }
}
