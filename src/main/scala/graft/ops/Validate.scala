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
      fieldErrors(schema, f, in(f.name), prefix = lit(""), parentPath = None))
    if (errs.isEmpty) lit(null).cast(StringType) else coalesce(errs: _*)
  }

  /** `parent: message` — or the bare message at the root (reference path
    * join, frontend.lua copy_data_eh).
    */
  private def msg(parentPath: Option[Column], m: String): Column =
    parentPath match {
      case None => lit(m)
      case Some(p) => concat(p, lit(s": $m"))
    }

  /** Errors of one record field, in declaration order. `prefix` is the
    * containing path with a trailing "/" (empty at the root); `parentPath`
    * is the containing record's own path (error location for Key missing).
    * Paths are Columns so array indices / map keys can appear in them
    * (reference: frontend.lua:883–931 — `1/1: …`, `a/b: …`).
    */
  private def fieldErrors(s: AvroSchema, f: Field, col: Column,
      prefix: Column, parentPath: Option[Column],
      depth: Int = 0): Seq[Column] = {
    val path = concat(prefix, lit(f.name))
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
      path: String): Seq[Column] = typeErrors(s, t0, col, lit(path), 0)

  private def typeErrors(s: AvroSchema, t0: AvroType, col: Column,
      path: Column, depth: Int): Seq[Column] = {
    if (depth >= SchemaConverters.MaxRecursionDepth) return Nil
    val t = s.resolve(t0)
    t match {
      case e: EnumType =>
        Seq(when(col.isNotNull &&
          !col.isin(e.symbols.map(x => x: Any): _*),
          concat(path, lit(": Bad value: \""), col, lit("\""))))
      case fx: FixedType =>
        Seq(when(col.isNotNull && length(col) =!= fx.size,
          concat(path, lit(s": Expecting BIN of length ${fx.size}. " +
            "Encountered BIN of length "), length(col), lit("."))))
      case r: RecordType =>
        r.fields.flatMap { f =>
          val inner = col.getField(f.name)
          val guarded = fieldErrors(s, f, inner, concat(path, lit("/")),
            Some(path), depth + 1)
          // only report inner errors when the struct itself is present
          guarded.map(g => when(col.isNotNull, g))
        }
      case a: ArrayType =>
        // element path = 1-based index (frontend.lua: stack.ptr = i)
        firstElementError(s, a.items, col, i =>
          concat(path, lit("/"), (i + 1).cast(StringType)), depth).toSeq
      case m: MapType =>
        // element path = map key
        val entries = map_entries(col)
        firstEntryError(s, m.values, entries, e =>
          concat(path, lit("/"), e.getField("key")), depth).toSeq
      case u: UnionType if !u.isNullableScalar =>
        // struct-form union: tag must be a valid branch index
        val tag = col.getField("$type$")
        Seq(when(col.isNotNull &&
          (tag.isNull || tag < 0 || tag >= u.branches.length),
          concat(path, lit(": Bad value: "), coalesce(tag.cast(StringType),
            lit("null")))))
      case _ => Nil
    }
  }

  /** First error of any element of `arr`, with the element's 1-based index
    * in the error path — full recursion into records/enums/fixed/nested
    * collections (reference: frontend.lua:883–890).
    */
  private def firstElementError(s: AvroSchema, elemT: AvroType, arr: Column,
      elemPath: Column => Column, depth: Int): Option[Column] = {
    // probe: does this element type produce any checks at all?
    if (typeErrors(s, elemT, lit(null), lit(""), depth + 1).isEmpty) None
    else {
      val perElem = transform(arr, (x, i) =>
        coalesce(typeErrors(s, elemT, x, elemPath(i), depth + 1): _*))
      val bad = filter(perElem, e => e.isNotNull)
      Some(when(arr.isNotNull && size(bad) > 0, element_at(bad, 1)))
    }
  }

  /** First error of any map entry, keyed path (frontend.lua:891–898). */
  private def firstEntryError(s: AvroSchema, valT: AvroType, entries: Column,
      entryPath: Column => Column, depth: Int): Option[Column] = {
    if (typeErrors(s, valT, lit(null), lit(""), depth + 1).isEmpty) None
    else {
      val perEntry = transform(entries, e =>
        coalesce(typeErrors(s, valT, e.getField("value"),
          entryPath(e), depth + 1): _*))
      val bad = filter(perEntry, e => e.isNotNull)
      Some(when(entries.isNotNull && size(bad) > 0, element_at(bad, 1)))
    }
  }
}
