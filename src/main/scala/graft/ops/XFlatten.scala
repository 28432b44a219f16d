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
    * float64 for float/double, bool for boolean, str for string/bytes —
    * and a union's value op resolves its runtime branch type through the
    * tag op at `pos - 1` (the two-op union contract,
    * compiler.lua:1002–1013). Container slots (array/map) encode as
    * their string rendering, matching this engine's flat-slot form — a
    * documented deviation from the reference's structural encode.
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
        case _ => raw // string/bytes/fixed/containers: str rendering
      }
  }

  private def kindOf(s: AvroSchema, t: AvroType): String =
    s.resolve(t) match {
      case p: PrimitiveType => p.typeName
      case _: EnumType => "enum"
      case _ => "str"
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
      when(src.isNotNull,
        array(op(pos, tag), op(pos + 1, value.cast(StringType))))
        .otherwise(typedEmpty())
    case other =>
      val slots = FlattenOps.slotsFor(c, other, src, readerT, "v")
      val cols = slots.zipWithIndex.map { case ((_, col), k) =>
        op(pos + k, col)
      }
      when(src.isNotNull, array(cols: _*)).otherwise(typedEmpty())
  }
}
