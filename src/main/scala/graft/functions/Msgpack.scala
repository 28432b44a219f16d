package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Minimal MessagePack codec for the reference's wire fast path.
  *
  * The reference's `flatten_msgpack` family keeps records ENCODED end to
  * end: a msgpack record comes in, a msgpack ARRAY of the flat tuple goes
  * out (runtime.lua:158–187 `msgpack_decode`/`msgpack_encode`; README.md:
  * 250–255). This engine's primary binary framing is Avro binary
  * ([[AvroBinary]] — self-describing via the schema registry model and
  * splittable container files, the right default on a Spark cluster), but
  * the msgpack FLAT-TUPLE framing is ratified here as a first-class wire
  * option so reference clients can hand tuples over unchanged:
  * [[encodeFlat]]/[[decodeFlat]] are the `flatten_msgpack`/
  * `unflatten_msgpack` byte contract for an already-flattened DataFrame
  * (records as arrays, positional fields — exactly the reference's tuple
  * layout).
  *
  * Supported types (the value model of runtime.lua's token array): nil,
  * bool, signed ints (fix/8/16/32/64 written; ALL int formats incl.
  * uint read), float32/64, str, bin, array, map. Encoding always picks
  * the smallest format — byte-compatible with what msgpack-lua emits for
  * the same values.
  */
object Msgpack {

  // ------------------------------------------------------------- encode

  private final class Writer {
    private var buf = new Array[Byte](256)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        buf = java.util.Arrays.copyOf(buf,
          math.max(buf.length * 2, len + n))
      }
    def b(v: Int): Unit = { ensure(1); buf(len) = v.toByte; len += 1 }
    def u16(v: Int): Unit = { b(v >>> 8); b(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    def u64(v: Long): Unit = { u32((v >>> 32).toInt); u32(v.toInt) }
    def raw(v: Array[Byte]): Unit = {
      ensure(v.length)
      System.arraycopy(v, 0, buf, len, v.length)
      len += v.length
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def writeValue(w: Writer, v: Any): Unit = v match {
    case null => w.b(0xc0)
    case b: Boolean => w.b(if (b) 0xc3 else 0xc2)
    case i: Byte => writeLong(w, i.toLong)
    case i: Short => writeLong(w, i.toLong)
    case i: Int => writeLong(w, i.toLong)
    case i: Long => writeLong(w, i)
    case f: Float => { w.b(0xca); w.u32(java.lang.Float.floatToIntBits(f)) }
    case d: Double =>
      w.b(0xcb); w.u64(java.lang.Double.doubleToLongBits(d))
    case s: String =>
      val bytes = s.getBytes("UTF-8")
      val n = bytes.length
      if (n <= 31) w.b(0xa0 | n)
      else if (n <= 0xff) { w.b(0xd9); w.b(n) }
      else if (n <= 0xffff) { w.b(0xda); w.u16(n) }
      else { w.b(0xdb); w.u32(n) }
      w.raw(bytes)
    case bin: Array[Byte] =>
      val n = bin.length
      if (n <= 0xff) { w.b(0xc4); w.b(n) }
      else if (n <= 0xffff) { w.b(0xc5); w.u16(n) }
      else { w.b(0xc6); w.u32(n) }
      w.raw(bin)
    case r: Row => writeArray(w, r.toSeq)
    case seq: scala.collection.Seq[_] => writeArray(w, seq)
    case m: scala.collection.Map[_, _] =>
      val n = m.size
      if (n <= 15) w.b(0x80 | n)
      else if (n <= 0xffff) { w.b(0xde); w.u16(n) }
      else { w.b(0xdf); w.u32(n) }
      m.foreach { case (k, mv) => writeValue(w, k); writeValue(w, mv) }
    case other => throw new IllegalArgumentException(
      s"msgpack: unsupported value ${other.getClass.getName}")
  }

  private def writeArray(w: Writer, seq: scala.collection.Seq[_]): Unit = {
    val n = seq.length
    if (n <= 15) w.b(0x90 | n)
    else if (n <= 0xffff) { w.b(0xdc); w.u16(n) }
    else { w.b(0xdd); w.u32(n) }
    seq.foreach(writeValue(w, _))
  }

  // positive values take the uint family, negative the int family —
  // the smallest-format rule msgpack-lua follows
  private def writeLong(w: Writer, v: Long): Unit =
    if (v >= 0) {
      if (v <= 0x7f) w.b(v.toInt)
      else if (v <= 0xff) { w.b(0xcc); w.b(v.toInt) }
      else if (v <= 0xffff) { w.b(0xcd); w.u16(v.toInt) }
      else if (v <= 0xffffffffL) { w.b(0xce); w.u32(v.toInt) }
      else { w.b(0xcf); w.u64(v) }
    } else {
      if (v >= -32) w.b(0xe0 | (v & 0x1f).toInt)
      else if (v >= Byte.MinValue) { w.b(0xd0); w.b(v.toInt) }
      else if (v >= Short.MinValue) { w.b(0xd1); w.u16(v.toInt) }
      else if (v >= Int.MinValue) { w.b(0xd2); w.u32(v.toInt) }
      else { w.b(0xd3); w.u64(v) }
    }

  /** Encode one value tree (null / Boolean / integral / Float / Double /
    * String / Array[Byte] / Seq / Row-as-array / Map) to msgpack bytes.
    */
  def encode(v: Any): Array[Byte] = {
    val w = new Writer
    writeValue(w, v)
    w.result()
  }

  // ------------------------------------------------------------- decode

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def i8(): Int = { val v = buf(pos).toInt; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u16().toLong) << 16) | u16()
    def u64(): Long = (u32() << 32) | u32()
    def raw(n: Int): Array[Byte] = {
      val v = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      v
    }
    def str(n: Int): String = new String(raw(n), "UTF-8")
  }

  private def readValue(r: Reader): Any = {
    val t = r.u8()
    if (t <= 0x7f) t.toLong // positive fixint
    else if (t >= 0xe0) (t - 256).toLong // negative fixint
    else if ((t & 0xf0) == 0x80) readMap(r, t & 0x0f)
    else if ((t & 0xf0) == 0x90) readArray(r, t & 0x0f)
    else if ((t & 0xe0) == 0xa0) r.str(t & 0x1f)
    else t match {
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => r.raw(r.u8())
      case 0xc5 => r.raw(r.u16())
      case 0xc6 => r.raw(r.u32().toInt)
      case 0xca => java.lang.Float.intBitsToFloat(r.u32().toInt)
      case 0xcb => java.lang.Double.longBitsToDouble(r.u64())
      case 0xcc => r.u8().toLong
      case 0xcd => r.u16().toLong
      case 0xce => r.u32()
      case 0xcf => r.u64() // uint64 > Long.Max wraps — documented limit
      case 0xd0 => r.i8().toLong
      case 0xd1 => r.u16().toShort.toLong
      case 0xd2 => r.u32().toInt.toLong
      case 0xd3 => r.u64()
      case 0xd9 => r.str(r.u8())
      case 0xda => r.str(r.u16())
      case 0xdb => r.str(r.u32().toInt)
      case 0xdc => readArray(r, r.u16())
      case 0xdd => readArray(r, r.u32().toInt)
      case 0xde => readMap(r, r.u16())
      case 0xdf => readMap(r, r.u32().toInt)
      case other => throw new IllegalArgumentException(
        f"msgpack: unsupported type byte 0x$other%02x at ${r.pos - 1}")
    }
  }

  private def readArray(r: Reader, n: Int): Vector[Any] =
    Vector.fill(n)(readValue(r))

  private def readMap(r: Reader, n: Int): Map[Any, Any] =
    Vector.fill(n)((readValue(r), readValue(r))).toMap

  /** Decode msgpack bytes to the value tree of [[encode]] (ints arrive
    * as Long, arrays as Vector, maps as Map). Trailing bytes are an
    * error — one value per buffer, the flat-tuple framing.
    */
  def decode(bytes: Array[Byte]): Any = {
    val r = new Reader(bytes)
    val v = readValue(r)
    if (r.pos != bytes.length) throw new IllegalArgumentException(
      s"msgpack: ${bytes.length - r.pos} trailing bytes")
    v
  }

  // ------------------------------------------- DataFrame flat framing

  /** `flatten_msgpack` byte contract: each row of an (already flattened)
    * DataFrame becomes ONE msgpack array of its positional values —
    * structs nest as arrays, exactly the reference's record-as-tuple
    * layout. Output: single binary column `as`.
    */
  def encodeFlat(df: DataFrame, as: String = "msgpack"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(
      StructType(Seq(StructField(as, BinaryType, nullable = false))))
    df.mapPartitions { rows =>
      rows.map(r => Row(encode(r)))
    }(enc)
  }

  /** `unflatten_msgpack` inverse of [[encodeFlat]]: decode the msgpack
    * arrays in `col` back into typed columns per `schema`. Field values
    * are coerced from the decoded tree (Long → int/short/byte columns,
    * Vector → arrays/structs) — a decode-layer concern, same as the
    * reference resolving msgpack LONG tokens against the target type.
    */
  def decodeFlat(df: DataFrame, colName: String,
      schema: StructType): DataFrame = {
    val idx = df.schema.fieldIndex(colName)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        decode(r.getAs[Array[Byte]](idx)) match {
          case arr: Vector[Any] @unchecked => coerceRow(arr, schema)
          case other => throw new IllegalArgumentException(
            s"msgpack: expected a tuple array, got $other")
        }
      }
    }(enc)
  }

  private def coerceRow(values: Seq[Any], schema: StructType): Row = {
    require(values.length == schema.length,
      s"msgpack: tuple arity ${values.length} != schema ${schema.length}")
    Row.fromSeq(values.zip(schema.fields).map { case (v, f) =>
      coerce(v, f.dataType)
    })
  }

  private def coerce(v: Any, dt: DataType): Any =
    if (v == null) null
    else (dt, v) match {
      case (LongType, l: Long) => l
      case (IntegerType, l: Long) => l.toInt
      case (ShortType, l: Long) => l.toShort
      case (ByteType, l: Long) => l.toByte
      case (DoubleType, d: Double) => d
      case (FloatType, f: Float) => f
      case (st: StructType, arr: Vector[Any] @unchecked) =>
        coerceRow(arr, st)
      case (ArrayType(et, _), arr: Vector[Any] @unchecked) =>
        arr.map(coerce(_, et))
      case (MapType(kt, vt, _), m: Map[Any, Any] @unchecked) =>
        m.map { case (k, mv) => coerce(k, kt) -> coerce(mv, vt) }
      // expected passthroughs, matched EXPLICITLY: anything else is a
      // type mismatch and must fail HERE with the field type named, not
      // later as an opaque RowEncoder ClassCastException
      case (StringType, s: String) => s
      case (BooleanType, b: Boolean) => b
      case (BinaryType, b: Array[Byte]) => b
      case _ => throw new IllegalArgumentException(
        s"msgpack: cannot decode ${v.getClass.getSimpleName} value" +
          s" '$v' as ${dt.simpleString}")
    }
}
