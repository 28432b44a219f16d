package graft.ops

import graft.schema._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType,
  StructField, StructType}

/** Update-operation extraction — the analog of the reference's `xflatten`
  * (reference: compiler.lua:920–1024): a *partial* object becomes the list
  * of `["=", position, value]` tuple-update operations for only the fields
  * present. Unions emit two ops (tag + value, compiler.lua:1002–1013).
  *
  * DataFrame form: NULL marks an absent field (SURVEY §7.3); the result is
  * an `ops` column `array<struct<op:string, pos:int, value:string>>` with
  * 1-based tuple positions offset by the service-field count. Values are
  * rendered as strings (heterogeneous types cannot share one Spark array);
  * the typed update is recoverable via the schema's `getTypes` at `pos`.
  */
object XFlatten {

  /** Append an `ops` column to an object-form (writer-shaped) DataFrame. */
  def apply(c: Compiled, df: DataFrame): DataFrame =
    df.withColumn("ops", opsColumn(c, name => df(name)))

  /** Serialized update-op list as JSON (the readable sink form): ops
    * rendered as a compact JSON array string ready for a log/bus sink.
    * For the reference's BYTE contract use [[opsMsgpack]].
    */
  def opsSerialized(c: Compiled, in: String => Column): Column =
    to_json(opsColumn(c, in))

  /** Msgpack byte framing of the update-op list — the `xflatten_msgpack`
    * analog (reference: init.lua:462–470 calling runtime msgpack encode,
    * runtime.lua:158–187): each row's ops encode as ONE msgpack array of
    * `["=", pos, value]` triples with the VALUE typed per the reader's
    * flat slot — int family for int/long/enum-index/union tag, float32/
    * float64 for float/double, bool for boolean, str for string/bytes,
    * and array/map slots as STRUCTURAL msgpack containers (the
    * reference's layout, runtime.lua:158–187 via unparse_msgpack:
    * integral elements as msgpack ints, decimals as float64 — the same
    * resolution msgpack-lua applies to Lua number values). A union's
    * value op resolves its runtime branch type through the tag op at
    * `pos - 1` (the two-op union contract, compiler.lua:1002–1013).
    * Output: the input columns plus `ops` and a binary column `as`.
    */
  def opsMsgpack(c: Compiled, df: DataFrame,
      as: String = "ops_msgpack"): DataFrame = {
    val withOps = apply(c, df)
    // driver-side: resolve every slot to a plain string descriptor so
    // the task closure ships only these (Compiled/AvroSchema stay on the
    // driver — they are not serializable, by design)
    val slots = flatSlots(c.reader)
    val sfOffset = c.serviceFields.length
    val outSchema = StructType(withOps.schema.fields :+
      StructField(as, BinaryType, nullable = false))
    val opsIdx = withOps.schema.fieldIndex("ops")
    withOps.mapPartitions { rows =>
      rows.map { r =>
        val ops = r.getSeq[Row](opsIdx)
        val byPos = ops.iterator.map(o => o.getInt(1) -> o.getString(2)).toMap
        val triples: Seq[Seq[Any]] = ops.map { o =>
          val pos = o.getInt(1)
          val raw = o.getString(2)
          val typed = slots(pos - sfOffset - 1) match {
            case Slot.Tag => if (raw == null) null else raw.toLong
            case Slot.UnionValue(kinds) =>
              // branch kind via the tag op the two-op contract
              // guarantees at pos - 1
              byPos.get(pos - 1).flatMap(Option(_))
                .map(t => Slot.parse(kinds(t.toInt), raw)).orNull
            case Slot.Value(k) => Slot.parse(k, raw)
          }
          Seq("=", pos, typed)
        }
        Row.fromSeq(r.toSeq :+ graft.functions.Msgpack.encode(triples))
      }
    }(Encoders.row(outSchema))
  }

  /** Flat-slot value descriptors, aligned with `getTypes` order (one
    * entry per tuple position before the service-field offset). Plain
    * strings + case classes: the executor-side typed-value parser must
    * not drag schema objects into the closure.
    */
  private[ops] object Slot {
    sealed trait T extends Serializable
    final case class Value(kind: String) extends T
    case object Tag extends T
    final case class UnionValue(branchKinds: Vector[String]) extends T

    def parse(kind: String, raw: String): Any =
      if (raw == null) null
      else kind match {
        case "int" | "long" => raw.toLong
        case "float" => raw.toFloat
        case "double" => raw.toDouble
        case "boolean" => raw.toBoolean
        case "null" => null
        // enum flat slots carry the S2I index (or the symbol under
        // utf8_enums) — int when integral, str otherwise
        case "enum" => raw.toLongOption.getOrElse(raw): Any
        // container slots arrive as the JSON rendering opsColumn emits
        // for them; rebuild the structure so Msgpack writes a REAL
        // msgpack array/map (the reference's structural layout), not a
        // quoted string of one
        case "array" | "map" => jsonToValue(
          org.json4s.jackson.JsonMethods.parse(raw))
        case _ => raw // string/bytes/fixed: str rendering
      }

    /** json4s AST → the plain value tree [[graft.functions.Msgpack]]
      * encodes: JSON ints become msgpack ints, JSON decimals float64 —
      * the same number resolution msgpack-lua applies to Lua values —
      * and object field order is preserved (deterministic bytes).
      */
    private def jsonToValue(v: org.json4s.JValue): Any = {
      import org.json4s._
      v match {
        case JNull | JNothing => null
        case JString(s) => s
        case JBool(b) => b
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d
        case JDecimal(d) => d.toDouble
        case JArray(xs) => xs.toVector.map(jsonToValue)
        case JObject(fs) => scala.collection.immutable.ListMap(
          fs.map { case (k, fv) => k -> jsonToValue(fv) }: _*)
        case JSet(xs) => xs.toVector.map(jsonToValue)
      }
    }
  }

  private def kindOf(s: AvroSchema, t: AvroType): String =
    s.resolve(t) match {
      case p: PrimitiveType => p.typeName
      case _: EnumType => "enum"
      case _: ArrayType => "array"
      case _: MapType => "map"
      case _ => "str"
    }

  /** String rendering of a slot value for the ops column: containers as
    * JSON (machine-parseable in the JSON sink AND re-buildable into
    * structural msgpack by [[Slot.parse]]), everything else as the plain
    * string cast.
    */
  private def renderSlot(s: AvroSchema, t: AvroType, v: Column): Column =
    s.resolve(t) match {
      case _: ArrayType | _: MapType => to_json(v)
      case _ => v.cast(StringType)
    }

  private def flatSlots(s: AvroSchema): Vector[Slot.T] = {
    val out = Vector.newBuilder[Slot.T]
    def walk(rec: RecordType): Unit = rec.fields.foreach { f =>
      s.resolve(f.tpe) match {
        case r: RecordType if !r.nullable => walk(r)
        case u: UnionType =>
          out += Slot.Tag
          out += Slot.UnionValue(u.branches.map(kindOf(s, _)))
        case other => out += Slot.Value(kindOf(s, other))
      }
    }
    walk(s.rootRecord)
    out.result()
  }

  def opsColumn(c: Compiled, in: String => Column): Column = {
    val rm = FlattenOps.rootRecordMapping(c.mapping)
    val sfOffset = c.serviceFields.length
    // target flat position of each reader field (1-based)
    var pos = sfOffset + 1
    val parts = Vector.newBuilder[Column]
    rm.to.fields.zipWithIndex.foreach { case (tf, o) =>
      val width = FlattenOps.flatWidth(c.reader, tf.tpe)
      rm.o2i(o).foreach { i =>
        val wf = rm.from.fields(i)
        parts += fieldOps(c, rm.fieldIr(i), in(wf.name),
          c.reader.resolve(tf.tpe), pos)
      }
      pos += width
    }
    val all = parts.result()
    if (all.isEmpty) typedEmpty()
    else filter(concat(all: _*), x => x.isNotNull)
  }

  private def typedEmpty(): Column =
    array().cast("array<struct<op:string,pos:int,value:string>>")

  private def op(pos: Int, value: Column): Column =
    struct(lit("=").as("op"), lit(pos).cast(IntegerType).as("pos"),
      value.cast(StringType).as("value"))

  /** Reference error for ungated nullable-record xflatten
    * (compiler.lua:981, spelling preserved).
    */
  val NullableRecordMsg: String =
    "xflatten for nullable record is on developement stage. " +
      "Use alpha_nullable_record_xflatten option if you understand " +
      "what you do."

  /** Ops for one present field; absent (NULL) fields contribute nothing. */
  private def fieldOps(c: Compiled, m: Mapping, src: Column,
      readerT: AvroType, pos: Int): Column = m match {
    case rm: Mapping.RecordM
        if rm.nullable && !c.alphaNullableRecordXFlatten =>
      // runtime-gated like the reference (il.error in the generated code):
      // absent fields still contribute nothing, present ones raise
      when(src.isNotNull, raise_error(lit(NullableRecordMsg)))
        .otherwise(typedEmpty())
    case rm: Mapping.RecordM if !rm.nullable =>
      // recurse: nested record fields update their own slots
      var p = pos
      val parts = rm.to.fields.zipWithIndex.flatMap { case (tf, o) =>
        val width = FlattenOps.flatWidth(c.reader, tf.tpe)
        val r = rm.o2i(o).map { i =>
          fieldOps(c, rm.fieldIr(i), src.getField(rm.from.fields(i).name),
            c.reader.resolve(tf.tpe), p)
        }
        p += width
        r
      }
      if (parts.isEmpty) typedEmpty()
      else when(src.isNotNull, concat(parts: _*)).otherwise(typedEmpty())
    case um: Mapping.UnionM =>
      // two ops: tag + value (reference: compiler.lua:1002–1013). Gate on
      // src alone: NULL marks *absent* in the partial-update convention, so
      // absent union fields contribute nothing — identical to the
      // value-level ConvertValue.xflattenRecord and the struct-union case.
      val (tag, value) = FlattenOps.unionTagAndValue(c, um, src)
      val readerNonNull = um.toBranches.zipWithIndex
        .filter(_._1.typeName != "null")
      val rendered =
        if (readerNonNull.length <= 1)
          readerNonNull.headOption
            .map { case (rb, _) => renderSlot(c.reader, rb, value) }
            .getOrElse(value.cast(StringType))
        else
          // multi-branch: the value op carries the ACTIVE branch's value
          // (what the reference's two-op contract and this engine's
          // value path ConvertValue.xflatten both emit), not the
          // internal struct-slot rendering of the flat tuple form
          readerNonNull.foldLeft(lit(null).cast(StringType)) {
            case (acc, (rb, o)) =>
              when(tag === o, renderSlot(c.reader, rb, value.getField(
                SchemaConverters.branchFieldName(c.reader, rb))))
                .otherwise(acc)
          }
      when(src.isNotNull, array(op(pos, tag), op(pos + 1, rendered)))
        .otherwise(typedEmpty())
    case other =>
      val slots = FlattenOps.slotsFor(c, other, src, readerT, "v")
      val cols = slots.zipWithIndex.map { case ((_, col), k) =>
        op(pos + k, renderSlot(c.reader, readerT, col))
      }
      when(src.isNotNull, array(cols: _*)).otherwise(typedEmpty())
  }
}
