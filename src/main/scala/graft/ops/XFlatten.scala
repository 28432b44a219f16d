package graft.ops

import graft.schema._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

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

  /** Serialized update-op list — the `xflatten_msgpack` analog
    * (reference: init.lua:462–470): ops rendered as a compact JSON array
    * string ready for a log/bus sink.
    */
  def opsSerialized(c: Compiled, in: String => Column): Column =
    to_json(opsColumn(c, in))

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
