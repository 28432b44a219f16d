package graft.ops

import graft.schema._
import scala.collection.immutable.ListMap

/** Record-at-a-time flatten/unflatten with the reference's exact value and
  * error contracts (reference: compiled routines, compiler.lua:510–891;
  * error rendering runtime.lua:275–336; goldens in test/ddt_suite/).
  *
  * This is the driver-side single-value complement of the DataFrame
  * projections in [[FlattenOps]] — the shape the reference's own API has
  * (`compiled.flatten(obj) → tuple`), used for golden-corpus parity and
  * small-object work; batches go through the Column trees.
  *
  * Flat tuple shape: `Vector[Any]` where unions occupy two slots
  * `[branchIdx, value]`, enums are reader symbol indices, nested records
  * inline, nullable records are `null` or a sub-`Vector`.
  */
object ConvertValue {

  final class ConvertError(val msg: String) extends RuntimeException(msg)

  private final class Ctx(val writer: AvroSchema, val reader: AvroSchema) {
    val path = scala.collection.mutable.ArrayBuffer.empty[String]
    def fail(msg: String): Nothing = {
      val p = path.mkString("/")
      throw new ConvertError(if (p.isEmpty) msg else s"$p: $msg")
    }
    def in[A](seg: String)(body: => A): A = {
      path += seg
      try body finally path.remove(path.length - 1)
    }
  }

  private def token(v: Any): String = ValidateValue.typeToken(v)
  private def quote(s: String): String = "\"" + s + "\""

  def flatten(c: Compiled, data: Any,
      serviceFields: Seq[Any] = Nil): Either[String, Vector[Any]] = {
    val ctx = new Ctx(c.writer, c.reader)
    try {
      val out = Vector.newBuilder[Any]
      serviceFields.foreach(out += _)
      c.mapping match {
        case rm: Mapping.RecordM if !rm.nullable =>
          flattenRecord(ctx, rm, data, out)
        case um: Mapping.UnionM =>
          // non-record union root: [tag, value] pair — or just the value
          // when the READER side is a scalar (union_versions.lua:66-69)
          val (tag, v) = flattenUnion(ctx, um, data)
          if (um.toIsUnion) out += tag
          out += v
        case m =>
          // array/map/primitive/nullable-record root: one slot
          // (test/ddt_suite/array.lua, map.lua root-schema forms)
          out += flattenValue(ctx, m, data)
      }
      Right(out.result())
    } catch { case e: ConvertError => Left(e.msg) }
  }

  /** Record flatten: iterate READER fields, pull writer values by writer
    * name, fill defaults; extra input keys rejected; dropped writer fields
    * still type-checked (reference: compiler.lua:510–619).
    */
  private def flattenRecord(ctx: Ctx, rm: Mapping.RecordM, data: Any,
      out: scala.collection.mutable.Builder[Any, Vector[Any]]): Unit =
    data match {
      case kv: Map[_, _] =>
        val smap = kv.asInstanceOf[Map[String, Any]]
        val writerNames = rm.from.fields.map(_.name).toSet
        val aliasTo = rm.from.fields
          .flatMap(f => f.aliases.map(_ -> f.name)).toMap
        smap.keys.foreach { k =>
          if (!writerNames(k) && !aliasTo.contains(k))
            ctx.fail(s"Unknown key: ${quote(k)}")
        }
        def writerValue(i: Int): Option[Any] = {
          val wf = rm.from.fields(i)
          smap.get(wf.name).orElse(
            wf.aliases.collectFirst { case a if smap.contains(a) => smap(a) })
        }
        // type-check dropped writer fields (present in input, absent in
        // reader) — reference still validates them
        rm.from.fields.zipWithIndex.foreach { case (wf, i) =>
          if (rm.i2o(i).isEmpty) writerValue(i).foreach { v =>
            ctx.in(wf.name) {
              val _ = flattenValue(ctx, rm.fieldIr(i), v)
            }
          }
        }
        rm.to.fields.zipWithIndex.foreach { case (tf, o) =>
          rm.o2i(o) match {
            case Some(i) =>
              val wf = rm.from.fields(i)
              writerValue(i) match {
                case Some(v) => ctx.in(wf.name) {
                  appendSlots(ctx, rm.fieldIr(i),
                    ctx.reader.resolve(tf.tpe), v, out)
                }
                case None => wf.default match {
                  case Some(d) => appendDefault(ctx,
                    ctx.reader.resolve(tf.tpe), d, out)
                  case None =>
                    val wt = ctx.writer.resolve(wf.tpe)
                    if (wt.nullable) appendSlots(ctx, rm.fieldIr(i),
                      ctx.reader.resolve(tf.tpe), null, out)
                    else wt match {
                      case u: UnionType
                          if u.branches.exists(_.typeName == "null") =>
                        appendSlots(ctx, rm.fieldIr(i),
                          ctx.reader.resolve(tf.tpe), null, out)
                      case _ => ctx.fail(s"Key missing: ${quote(wf.name)}")
                    }
                }
              }
            case None =>
              appendDefault(ctx, ctx.reader.resolve(tf.tpe),
                tf.default.get, out)
          }
        }
      case _ => ctx.fail(s"Expecting MAP, encountered ${token(data)}")
    }

  /** Append a default value in flat form for a reader type
    * (reference: compiler.lua:218–223; union defaults take the first
    * branch, frontend.lua:975–983).
    */
  private def appendDefault(ctx: Ctx, readerT: AvroType, d: JValue,
      out: scala.collection.mutable.Builder[Any, Vector[Any]]): Unit =
    ctx.reader.resolve(readerT) match {
      case r: RecordType if !r.nullable =>
        val dObj = d match { case o: JObject => o
          case _ => JObject(Vector.empty) }
        r.fields.foreach { f =>
          val fd = dObj.get(f.name).orElse(f.default).getOrElse(JNull)
          appendDefault(ctx, f.tpe, fd, out)
        }
      case u: UnionType =>
        if (d == JNull && u.branches.exists(_.typeName == "null")) {
          out += u.branches.indexWhere(_.typeName == "null")
          out += null
        } else {
          out += 0
          out += defaultScalar(ctx, u.branches.head, d)
        }
      case other =>
        out += defaultScalar(ctx, other, d)
    }

  private def defaultScalar(ctx: Ctx, t: AvroType, d: JValue): Any =
    ctx.reader.resolve(t) match {
      case e: EnumType => d match {
        case JString(sym) => e.symbolIndex.getOrElse(sym,
          ctx.fail(s"Bad value: ${quote(sym)}"))
        case _ => null
      }
      case r: RecordType =>
        val dObj = d match { case o: JObject => o
          case _ => JObject(Vector.empty) }
        if (d == JNull && r.nullable) null
        else {
          val out = Vector.newBuilder[Any]
          r.fields.foreach { f =>
            val fd = dObj.get(f.name).orElse(f.default).getOrElse(JNull)
            appendDefault(ctx, f.tpe, fd, out)
          }
          out.result()
        }
      case _ =>
        ValidateValue.validateDefault(ctx.reader, t, d)
          .fold(e => ctx.fail(e), identity)
    }

  /** Append the flat slots of one mapped value. */
  private def appendSlots(ctx: Ctx, m: Mapping, readerT: AvroType, v: Any,
      out: scala.collection.mutable.Builder[Any, Vector[Any]]): Unit =
    m match {
      case rm: Mapping.RecordM if !rm.nullable =>
        flattenRecord(ctx, rm, v, out)
      case um: Mapping.UnionM =>
        val (tag, value) = flattenUnion(ctx, um, v)
        out += tag
        out += value
      case other => out += flattenValue(ctx, other, v)
    }

  /** Single-slot (nested) conversion of one value. */
  private def flattenValue(ctx: Ctx, m: Mapping, v: Any): Any = m match {
    case Mapping.Prim(from, to, nullable) =>
      if (v == null) {
        // the null TYPE's only valid value is null (validate.lua:1–13)
        if (nullable || from == "null") null
        else ctx.fail(s"Expecting ${primToken(from)}, encountered NIL")
      } else checkPrim(ctx, from, to, v)
    case Mapping.FixedM(size, nullable) =>
      if (v == null) {
        if (nullable) null else ctx.fail("Expecting BIN, encountered NIL")
      } else {
        val len = v match {
          case b: Array[Byte] => b.length
          case s: String => s.length
          case _ => ctx.fail(s"Expecting BIN, encountered ${token(v)}")
        }
        if (len != size) ctx.fail(
          s"Expecting BIN of length $size. Encountered BIN of length $len.")
        v
      }
    case em: Mapping.EnumM =>
      if (v == null) {
        if (em.nullable) null
        else ctx.fail("Expecting STR, encountered NIL")
      } else v match {
        case s: String => em.from.symbolIndex.get(s) match {
          case None => ctx.fail(s"Bad value: ${quote(s)}")
          case Some(i) => em.i2o(i) match {
            case Some(o) => o
            case None =>
              ctx.fail(s"Bad value: ${quote(s)} (schema versioning)")
          }
        }
        case _ => ctx.fail(s"Expecting STR, encountered ${token(v)}")
      }
    case am: Mapping.ArrayM => v match {
      case null if am.nullable => null
      case xs: Seq[_] => xs.zipWithIndex.map { case (x, i) =>
        ctx.in((i + 1).toString)(flattenValue(ctx, am.nested, x)) }.toVector
      case _ => ctx.fail(s"Expecting ARRAY, encountered ${token(v)}")
    }
    case mm: Mapping.MapM => v match {
      case null if mm.nullable => null
      case kv: Map[_, _] => ListMap(kv.toSeq.map {
        case (k: String, x) =>
          k -> ctx.in(k)(flattenValue(ctx, mm.nested, x))
        case _ => ctx.fail("Non-string key")
      }: _*)
      case _ => ctx.fail(s"Expecting MAP, encountered ${token(v)}")
    }
    case rm: Mapping.RecordM =>
      if (v == null) {
        if (rm.nullable) null
        else ctx.fail(
          s"Expecting MAP, encountered NIL")
      } else {
        val out = Vector.newBuilder[Any]
        flattenRecord(ctx, rm, v, out)
        out.result()
      }
    case um: Mapping.UnionM =>
      val (tag, value) = flattenUnion(ctx, um, v)
      // union→scalar evolution drops the tag (union_versions.lua:66-69)
      if (um.toIsUnion) Vector(tag, value) else value
  }

  /** Union flatten: `{branch: value}` single-key map (or null) →
    * (readerBranchIdx, value) (reference: compiler.lua:624–692;
    * goldens union.lua:9–58).
    */
  private def flattenUnion(ctx: Ctx, um: Mapping.UnionM,
      v: Any): (Any, Any) = {
    def branchOut(i: Int, bv: Any): (Any, Any) = um.i2o(i) match {
      case Some(o) =>
        val conv = um.branchIr(i) match {
          case Some(m) => flattenValue(ctx, m, bv)
          case None => null
        }
        (o, conv)
      case None =>
        val tag = ValidateValue.branchTag(ctx.writer, um.fromBranches(i))
        ctx.fail(s"Bad value: ${quote(tag)} (schema versioning)")
    }
    if (!um.fromIsUnion) branchOut(0, v)
    else v match {
      case null =>
        val nIdx = um.fromBranches.indexWhere(_.typeName == "null")
        if (nIdx < 0)
          ctx.fail("Expecting MAP of length 1. Encountered NIL.")
        um.i2o(nIdx) match {
          case Some(o) => (o, null)
          case None => ctx.fail("Bad value: null (schema versioning)")
        }
      case kv: Map[_, _] =>
        if (kv.size != 1) ctx.fail(
          s"Expecting MAP of length 1. Encountered MAP of length ${kv.size}.")
        val (k, bv) = kv.head match {
          case (k: String, x) => (k, x)
          case _ => ctx.fail("Non-string key")
        }
        val i = um.fromBranches.indexWhere(b =>
          ValidateValue.branchTag(ctx.writer, b) == k)
        if (i < 0) ctx.fail(s"Unknown key: ${quote(k)}")
        // a writer branch the reader dropped is an unknown KEY at the
        // union level, suffixed as evolution-caused
        // (test/ddt_suite/union_versions.lua:25-30)
        if (um.i2o(i).isEmpty)
          ctx.fail(s"Unknown key: ${quote(k)} (schema versioning)")
        ctx.in(k)(branchOut(i, bv))
      case _ => ctx.fail(s"Expecting MAP, encountered ${token(v)}")
    }
  }

  private def primToken(name: String): String = name match {
    case "null" => "NIL"
    case "boolean" => "BOOL"
    case "int" => "INT"
    case "long" => "LONG"
    case "float" => "FLOAT"
    case "double" => "DOUBLE"
    case "bytes" => "BIN"
    case "string" => "STR"
    case other => other.toUpperCase
  }

  private def checkPrim(ctx: Ctx, from: String, to: String, v: Any): Any = {
    val checked: Any = from match {
      case "boolean" => v match {
        case b: Boolean => b
        case _ => ctx.fail(s"Expecting BOOL, encountered ${token(v)}")
      }
      case "int" => v match {
        case i: Int => i.toLong
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l
        // LL suffix mirrors the reference's LuaJIT long rendering
        // (test/ddt_suite/int.lua:88)
        case l: Long => ctx.fail(s"Value exceeds INT range: ${l}LL")
        case _ => ctx.fail(s"Expecting INT, encountered ${token(v)}")
      }
      case "long" => v match {
        case i: Int => i.toLong
        case l: Long => l
        case _ => ctx.fail(s"Expecting LONG, encountered ${token(v)}")
      }
      case "float" | "double" => v match {
        case d: Double => d
        case f: Float => f.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case _ =>
          ctx.fail(s"Expecting ${primToken(from)}, encountered ${token(v)}")
      }
      case "string" => v match {
        case s: String => s
        case _ => ctx.fail(s"Expecting STR, encountered ${token(v)}")
      }
      // BIN and STR are distinct runtime token families: a plain string
      // is NOT a valid bytes value (bytes.lua:57–61, bytes_promo.lua:7–11)
      case "bytes" => v match {
        case b: Array[Byte] => b
        case _ => ctx.fail(s"Expecting BIN, encountered ${token(v)}")
      }
      case "null" => v match {
        case null => null
        case _ => ctx.fail(s"Expecting NIL, encountered ${token(v)}")
      }
      case _ => v
    }
    (from, to) match {
      case (f, t) if f == t => checked
      case ("int", "long") => checked
      case ("int" | "long", "float" | "double") =>
        checked.asInstanceOf[Long].toDouble
      case ("float", "double") => checked
      // string↔bytes promotion converts the representation (UTF-8), so a
      // promoted slot carries the READER's token family
      // (string_promo.lua:1–5, bytes_promo.lua:1–5)
      case ("string", "bytes") => checked.asInstanceOf[String]
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case ("bytes", "string") => new String(
        checked.asInstanceOf[Array[Byte]],
        java.nio.charset.StandardCharsets.UTF_8)
      case _ => checked
    }
  }

  // -------------------------------------------------------------------
  // xflatten: partial object → update operations
  // -------------------------------------------------------------------

  /** Partial object → `["=", pos, value]` update ops for present fields
    * only, in schema order with 1-based tuple positions
    * (reference: compiler.lua:920–1024; goldens record.lua:349–400;
    * unions emit two ops, compiler.lua:1002–1013).
    */
  def xflatten(c: Compiled, partial: Any): Either[String, Vector[Vector[Any]]] = {
    val ctx = new Ctx(c.writer, c.reader)
    try {
      val rm = FlattenOps.rootRecordMapping(c.mapping)
      val out = Vector.newBuilder[Vector[Any]]
      xflattenRecord(ctx, rm, partial, c.serviceFields.length + 1, out,
        c.alphaNullableRecordXFlatten)
      Right(out.result())
    } catch { case e: ConvertError => Left(e.msg) }
  }

  private def xflattenRecord(ctx: Ctx, rm: Mapping.RecordM, data: Any,
      basePos: Int,
      out: scala.collection.mutable.Builder[Vector[Any], Vector[Vector[Any]]],
      alphaNullableRecord: Boolean = false): Unit = data match {
    case kv: Map[_, _] =>
      val smap = kv.asInstanceOf[Map[String, Any]]
      val writerNames = rm.from.fields.map(_.name).toSet
      smap.keys.foreach { k =>
        if (!writerNames(k)) ctx.fail(s"Unknown key: ${quote(k)}")
      }
      var pos = basePos
      rm.to.fields.zipWithIndex.foreach { case (tf, o) =>
        val width = FlattenOps.flatWidth(ctx.reader, tf.tpe)
        rm.o2i(o).foreach { i =>
          val wf = rm.from.fields(i)
          smap.get(wf.name).foreach { v =>
            ctx.in(wf.name) {
              (rm.fieldIr(i), ctx.reader.resolve(tf.tpe)) match {
                case (nested: Mapping.RecordM, _)
                    if nested.nullable && !alphaNullableRecord =>
                  // reference alpha gate (compiler.lua:978–994)
                  ctx.fail(graft.ops.XFlatten.NullableRecordMsg)
                case (nested: Mapping.RecordM, rt: RecordType)
                    if !nested.nullable && !rt.nullable =>
                  xflattenRecord(ctx, nested, v, pos, out,
                    alphaNullableRecord)
                case (um: Mapping.UnionM, _) =>
                  val (tag, value) = flattenUnion(ctx, um, v)
                  out += Vector("=", pos, tag)
                  out += Vector("=", pos + 1, value)
                case (m, _) =>
                  out += Vector("=", pos, flattenValue(ctx, m, v))
              }
            }
          }
        }
        pos += width
      }
    case _ => ctx.fail(s"Expecting MAP, encountered ${token(data)}")
  }

  // -------------------------------------------------------------------
  // unflatten
  // -------------------------------------------------------------------

  def unflatten(c: Compiled, tuple: Seq[Any]): Either[String, Any] =
    unflattenWithServiceFields(c, tuple).map(_._1)

  /** Unflatten returning the service-field prefix values as well —
    * the reference's method-form unflatten returns `(obj, sf...)`
    * (init.lua:249–268 gen_fetch_service_fields); the prefix slots are
    * type-guarded with 1-based slot paths
    * (test/ddt_suite/service_fields.lua).
    */
  def unflattenWithServiceFields(c: Compiled,
      tuple: Seq[Any]): Either[String, (Any, Vector[Any])] = {
    val ctx = new Ctx(c.writer, c.reader)
    try {
      val expect = c.writerFlatWidth + c.serviceFields.length
      if (tuple.length != expect) ctx.fail(
        s"Expecting ARRAY of length $expect. " +
          s"Encountered ARRAY of length ${tuple.length}.")
      val sf = c.serviceFields.zipWithIndex.map { case (dt, i) =>
        checkServiceField(ctx, dt, tuple(i), i + 1)
      }.toVector
      val cursor = new FlattenOps.SlotCursor
      cursor.pos = c.serviceFields.length
      val obj = c.mapping match {
        case rm: Mapping.RecordM if !rm.nullable =>
          unflattenRecord(ctx, rm, tuple.toVector, cursor)
        case m => unflattenValue(ctx, m, tuple.toVector, cursor)
      }
      Right((obj, sf))
    } catch { case e: ConvertError => Left(e.msg) }
  }

  /** Type guard for one service-field slot (reference IL ISBOOL/ISINT/…;
    * numbers auto-repair into float/double like runtime.lua:275–295).
    */
  private def checkServiceField(ctx: Ctx, dt: org.apache.spark.sql.types
      .DataType, v: Any, pos: Int): Any = {
    import org.apache.spark.sql.types._
    def bad(tok: String): Nothing = ctx.fail(
      s"$pos: Expecting $tok, encountered ${ValidateValue.typeToken(v)}")
    dt match {
      case BooleanType => v match {
        case b: Boolean => b
        case _ => bad("BOOL")
      }
      case IntegerType => v match {
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l
        case i: Int => i.toLong
        case _ => bad("INT")
      }
      case LongType => v match {
        case l: Long => l
        case i: Int => i.toLong
        case _ => bad("LONG")
      }
      case FloatType => v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case _ => bad("FLOAT")
      }
      case DoubleType => v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case _ => bad("DOUBLE")
      }
      case StringType => v match {
        case s: String => s
        case _ => bad("STR")
      }
      case BinaryType => v match {
        case b: Array[Byte] => b
        case _ => bad("BIN")
      }
      case _ => v
    }
  }

  private def unflattenRecord(ctx: Ctx, rm: Mapping.RecordM,
      slots: Vector[Any], cursor: FlattenOps.SlotCursor): Any = {
    val writerVals: Vector[Any] =
      rm.from.fields.zipWithIndex.map { case (wf, i) =>
        unflattenValue(ctx, rm.fieldIr(i), slots, cursor)
      }
    ListMap(rm.to.fields.zipWithIndex.flatMap { case (tf, o) =>
      if (tf.hidden) None
      else Some(tf.name -> (rm.o2i(o) match {
        case Some(i) => writerVals(i)
        case None => ValidateValue.validateDefault(ctx.reader, tf.tpe,
          tf.default.get).fold(e => ctx.fail(e), identity)
      }))
    }: _*)
  }

  private def unflattenValue(ctx: Ctx, m: Mapping, slots: Vector[Any],
      cursor: FlattenOps.SlotCursor): Any = m match {
    case Mapping.Prim(from, to, nullable) =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString) {
        val v = slots(pos)
        if (v == null) {
          if (nullable || from == "null") null
          else ctx.fail(s"Expecting ${primToken(from)}, encountered NIL")
        } else checkPrim(ctx, from, to, v)
      }
    case Mapping.FixedM(size, nullable) =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString)(
        flattenValue(ctx, Mapping.FixedM(size, nullable), slots(pos)))
    case em: Mapping.EnumM =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString) {
        slots(pos) match {
          case null if em.nullable => null
          case i: Int => enumIdxToSymbol(ctx, em, i.toLong)
          case l: Long => enumIdxToSymbol(ctx, em, l)
          case other =>
            ctx.fail(s"Expecting INT, encountered ${token(other)}")
        }
      }
    case am: Mapping.ArrayM =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString) {
        slots(pos) match {
          case null if am.nullable => null
          case xs: Seq[_] => xs.zipWithIndex.map { case (x, i) =>
            ctx.in((i + 1).toString)(unflattenNested(ctx, am.nested, x))
          }.toVector
          case other =>
            ctx.fail(s"Expecting ARRAY, encountered ${token(other)}")
        }
      }
    case mm: Mapping.MapM =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString) {
        slots(pos) match {
          case null if mm.nullable => null
          case kv: Map[_, _] => ListMap(kv.toSeq.map {
            case (k: String, x) =>
              k -> ctx.in(k)(unflattenNested(ctx, mm.nested, x))
            case _ => ctx.fail("Non-string key")
          }: _*)
          case other =>
            ctx.fail(s"Expecting MAP, encountered ${token(other)}")
        }
      }
    case rm: Mapping.RecordM if !rm.nullable =>
      unflattenRecord(ctx, rm, slots, cursor)
    case rm: Mapping.RecordM =>
      val pos = cursor.take()
      ctx.in((pos + 1).toString) {
        slots(pos) match {
          case null => null
          case xs: Seq[_] =>
            val sub = new FlattenOps.SlotCursor
            unflattenRecord(ctx, rm, xs.toVector.asInstanceOf[Vector[Any]],
              sub)
          case other =>
            ctx.fail(s"Expecting ARRAY, encountered ${token(other)}")
        }
      }
    case um: Mapping.UnionM if !um.fromIsUnion =>
      // scalar writer evolved into a reader union: ONE slot, implicit
      // branch 0 (test/ddt_suite/union_versions.lua:117-120)
      val pos = cursor.take()
      val o = um.i2o(0).getOrElse(
        ctx.fail("Bad value: 0 (schema versioning)"))
      val b = um.toBranches(o)
      if (b.typeName == "null") null
      else {
        val conv = um.branchIr(0) match {
          case Some(m) =>
            ctx.in((pos + 1).toString)(
              unflattenNested(ctx, m, slots(pos)))
          case None => null
        }
        if (!um.toIsUnion) conv
        else ListMap(ValidateValue.branchTag(ctx.reader, b) -> conv)
      }
    case um: Mapping.UnionM =>
      val tagPos = cursor.take()
      val valPos = cursor.take()
      val (i, o) = ctx.in((tagPos + 1).toString) {
        val tag = slots(tagPos) match {
          case x: Int => x.toLong
          case l: Long => l
          case other =>
            ctx.fail(s"Expecting INT, encountered ${token(other)}")
        }
        if (tag < 0 || tag >= um.fromBranches.length)
          ctx.fail(s"Bad value: $tag")
        um.i2o(tag.toInt) match {
          case None => ctx.fail(s"Bad value: $tag (schema versioning)")
          case Some(oo) => (tag.toInt, oo)
        }
      }
      val b = um.toBranches(o)
      if (b.typeName == "null") null
      else {
        val conv = ctx.in((valPos + 1).toString)(
          unflattenNested(ctx, um.branchIr(i).get, slots(valPos)))
        if (!um.toIsUnion) conv
        else ListMap(ValidateValue.branchTag(ctx.reader, b) -> conv)
      }
  }

  private def enumIdxToSymbol(ctx: Ctx, em: Mapping.EnumM, i: Long): String = {
    if (i < 0 || i >= em.from.symbols.length) ctx.fail(s"Bad value: $i")
    em.i2o(i.toInt) match {
      case Some(o) => em.to.symbols(o)
      case None => ctx.fail(s"Bad value: $i (schema versioning)")
    }
  }

  /** Nested (already-unpacked) flat value → object form. */
  private def unflattenNested(ctx: Ctx, m: Mapping, v: Any): Any = m match {
    case Mapping.Prim(from, to, nullable) =>
      if (v == null) {
        if (nullable || from == "null") null
        else ctx.fail(s"Expecting ${primToken(from)}, encountered NIL")
      } else checkPrim(ctx, from, to, v)
    case fm: Mapping.FixedM => flattenValue(ctx, fm, v)
    case em: Mapping.EnumM => v match {
      case null if em.nullable => null
      case i: Int => enumIdxToSymbol(ctx, em, i.toLong)
      case l: Long => enumIdxToSymbol(ctx, em, l)
      case other => ctx.fail(s"Expecting INT, encountered ${token(other)}")
    }
    case am: Mapping.ArrayM => v match {
      case null if am.nullable => null
      case xs: Seq[_] => xs.zipWithIndex.map { case (x, i) =>
        ctx.in((i + 1).toString)(unflattenNested(ctx, am.nested, x))
      }.toVector
      case other => ctx.fail(s"Expecting ARRAY, encountered ${token(other)}")
    }
    case mm: Mapping.MapM => v match {
      case null if mm.nullable => null
      case kv: Map[_, _] => ListMap(kv.toSeq.map {
        case (k: String, x) =>
          k -> ctx.in(k)(unflattenNested(ctx, mm.nested, x))
        case _ => ctx.fail("Non-string key")
      }: _*)
      case other => ctx.fail(s"Expecting MAP, encountered ${token(other)}")
    }
    case rm: Mapping.RecordM => v match {
      case null if rm.nullable => null
      case xs: Seq[_] =>
        val sub = new FlattenOps.SlotCursor
        unflattenRecord(ctx, rm, xs.toVector.asInstanceOf[Vector[Any]], sub)
      case other => ctx.fail(s"Expecting ARRAY, encountered ${token(other)}")
    }
    case um: Mapping.UnionM if !um.fromIsUnion =>
      // scalar writer → union reader nested in an array/map: the nested
      // flat form is the bare branch-0 value (mirrors the slot-level case)
      unflattenValue(ctx, um, Vector(v), new FlattenOps.SlotCursor)
    case um: Mapping.UnionM => v match {
      case xs: Seq[_] if xs.length == 2 =>
        val sub = Vector(xs(0), xs(1))
        val c2 = new FlattenOps.SlotCursor
        unflattenValue(ctx, um, sub, c2)
      case other => ctx.fail(s"Expecting ARRAY, encountered ${token(other)}")
    }
  }
}
