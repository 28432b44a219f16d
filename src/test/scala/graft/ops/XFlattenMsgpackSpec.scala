package graft.ops

import graft.SparkTestBase
import graft.schema.Avro
import org.scalatest.funsuite.AnyFunSuite

/** Golden-BYTE contract for the msgpack framing of xflatten op lists —
  * the `xflatten_msgpack` analog (reference: init.lua:462–470,
  * runtime.lua:158–187; two-op union contract compiler.lua:1002–1013).
  *
  * Every golden below is a hand-computed msgpack byte string (format
  * bytes from the PUBLIC msgpack spec), NOT derived from the codec under
  * test — op-list encoding and byte layout are pinned independently.
  */
class XFlattenMsgpackSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private val schema = Avro.create(
    """{"name":"p","type":"record","fields":[
      {"name":"a","type":"long"},
      {"name":"b","type":"string"},
      {"name":"u","type":["null","int"]}]}""")
  private val c = FlattenOps.compile(schema).fold(e => sys.error(e), identity)

  test("scalar + two-op union encode as typed [\"=\",pos,value] triples") {
    // row (a=7, b="x", u=int 5) → ops [["=",1,7],["=",2,"x"],["=",3,1],
    // ["=",4,5]]: tag op carries the branch index (int branch = 1), the
    // value op carries the TYPED branch value (msgpack int, not str)
    // writer ["null","int"] is the nullable-scalar union shape: the
    // source column is a plain nullable int
    val df = Seq((7L, "x", 5)).toDF("a", "b", "u")
    val bytes = XFlatten.opsMsgpack(c, df)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    // 94                       array(4)
    //  93 a1 3d 01 07          ["=" 1 7]
    //  93 a1 3d 02 a1 78       ["=" 2 "x"]
    //  93 a1 3d 03 01          ["=" 3 1]     (union tag, int)
    //  93 a1 3d 04 05          ["=" 4 5]     (union value, TYPED int)
    assert(hex(bytes) ==
      "94" + "93a13d0107" + "93a13d02a178" + "93a13d0301" + "93a13d0405")
  }

  test("absent fields (NULL) contribute no ops; empty list is 0x90") {
    val df = Seq((Some(9L), Option.empty[String])).toDF("a", "b")
      .selectExpr("a", "b", "cast(null as int) as u")
    val bytes = XFlatten.opsMsgpack(c, df)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    // only a present: 91 93 a1 3d 01 09
    assert(hex(bytes) == "91" + "93a13d0109")

    val none = Seq((Option.empty[Long], Option.empty[String]))
      .toDF("a", "b")
      .selectExpr("a", "b", "cast(null as int) as u")
    val noneBytes = XFlatten.opsMsgpack(c, none)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    assert(hex(noneBytes) == "90")
  }

  test("double and boolean values keep their msgpack scalar formats") {
    val s2 = Avro.create(
      """{"name":"q","type":"record","fields":[
        {"name":"d","type":"double"},{"name":"f","type":"boolean"}]}""")
    val c2 = FlattenOps.compile(s2).fold(e => sys.error(e), identity)
    val df = Seq((1.5, true)).toDF("d", "f")
    val bytes = XFlatten.opsMsgpack(c2, df)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    // 92 | ["=" 1 1.5]: 93 a1 3d 01 cb 3ff8000000000000
    //    | ["=" 2 true]: 93 a1 3d 02 c3
    assert(hex(bytes) ==
      "92" + "93a13d01cb3ff8000000000000" + "93a13d02c3")
  }

  test("service-field offset shifts positions like the reference tuple") {
    val s3 = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"a","type":"long"}]}""")
    val c3 = FlattenOps.compile(s3, s3,
      serviceFields = Seq(org.apache.spark.sql.types.LongType))
      .fold(e => sys.error(e), identity)
    val df = Seq(Tuple1(7L)).toDF("a")
    val bytes = XFlatten.opsMsgpack(c3, df)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    // one service field → a sits at tuple position 2: 91 93 a1 3d 02 07
    assert(hex(bytes) == "91" + "93a13d0207")
  }

  test("array and map slots encode as STRUCTURAL msgpack containers") {
    // the reference encodes container slot values through its real
    // msgpack encoder (init.lua:462–470, runtime.lua:158–187) — an
    // array-valued op carries a msgpack ARRAY, not a string rendering
    val s4 = Avro.create(
      """{"name":"t","type":"record","fields":[
        {"name":"tags","type":{"type":"array","items":"int"}},
        {"name":"m","type":{"type":"map","values":"long"}}]}""")
    val c4 = FlattenOps.compile(s4).fold(e => sys.error(e), identity)
    val df = Seq((Seq(1, 2, 3), Map("a" -> 1L))).toDF("tags", "m")
    val enc = XFlatten.opsMsgpack(c4, df)
    val bytes = enc.select("ops_msgpack").head().getAs[Array[Byte]](0)
    // 92 | ["=" 1 [1,2,3]]: 93 a1 3d 01 93 01 02 03
    //    | ["=" 2 {"a":1}]: 93 a1 3d 02 81 a1 61 01
    assert(hex(bytes) ==
      "92" + "93a13d0193010203" + "93a13d0281a16101")
    // and the JSON ops form renders the same slots as JSON text
    val ops = enc.select("ops").head().getSeq[org.apache.spark.sql.Row](0)
    assert(ops.map(_.getString(2)) == Seq("[1,2,3]", """{"a":1}"""))
  }

  test("union with a container branch carries a structural value op") {
    val s5 = Avro.create(
      """{"name":"t","type":"record","fields":[
        {"name":"u","type":["null",{"type":"array","items":"int"}]}]}""")
    val c5 = FlattenOps.compile(s5).fold(e => sys.error(e), identity)
    val df = Seq(Tuple1(Seq(7))).toDF("u")
    val bytes = XFlatten.opsMsgpack(c5, df)
      .select("ops_msgpack").head().getAs[Array[Byte]](0)
    // 92 | tag op ["=" 1 1]: 93 a1 3d 01 01
    //    | value op ["=" 2 [7]]: 93 a1 3d 02 91 07
    assert(hex(bytes) == "92" + "93a13d0101" + "93a13d029107")
  }

  test("multi-branch union value op carries the ACTIVE branch value") {
    // the value-path ConvertValue.xflatten and the reference two-op
    // contract both emit the branch VALUE — the Column path must not
    // leak the internal struct slot rendering
    val s6 = Avro.create(
      """{"name":"t","type":"record","fields":[
        {"name":"pv","type":["null","int","string"]}]}""")
    val c6 = FlattenOps.compile(s6).fold(e => sys.error(e), identity)
    val df = spark.sql(
      """SELECT named_struct('$type$', 2, 'int', cast(null as int),
        'string', 'hi') AS pv""")
    val enc = XFlatten.opsMsgpack(c6, df)
    val ops = enc.select("ops").head().getSeq[org.apache.spark.sql.Row](0)
    assert(ops == Seq(org.apache.spark.sql.Row("=", 1, "2"),
      org.apache.spark.sql.Row("=", 2, "hi")))
    val bytes = enc.select("ops_msgpack").head().getAs[Array[Byte]](0)
    // 92 | ["=" 1 2]: 93 a1 3d 01 02 | ["=" 2 "hi"]: 93 a1 3d 02 a2 68 69
    assert(hex(bytes) == "92" + "93a13d0102" + "93a13d02a26869")
  }

  test("msgpack ops agree with the JSON ops on a real table shape") {
    // same schema as the xflatten_events_props gate query — the two
    // serializations must describe identical (op,pos,value) triples
    val props = Avro.create(
      """{"name":"update","type":"record","fields":[
        {"name":"event_id","type":"long"},{"name":"k","type":"int"}]}""")
    val cp = FlattenOps.compile(props).fold(e => sys.error(e), identity)
    val df = Seq((10L, 3), (11L, 4)).toDF("event_id", "k")
    val enc = XFlatten.opsMsgpack(cp, df)
    val decoded = enc.select("ops_msgpack").collect().map(r =>
      graft.functions.Msgpack.decode(r.getAs[Array[Byte]](0)))
    val fromJson = enc.select("ops").collect().map(r =>
      r.getSeq[org.apache.spark.sql.Row](0).map(o =>
        Vector("=", o.getInt(1).toLong, o.getString(2).toLong)))
    assert(decoded.toVector == fromJson.toVector.map(_.toVector))
  }
}
