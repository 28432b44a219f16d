package graft.ops

import graft.SparkTestBase
import graft.schema._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The engine has two flatten implementations: the record-at-a-time value
  * converter (ConvertValue — DDT golden parity) and the compiled Column
  * trees (FlattenOps.Compiled — the distributed path). They must never
  * drift: this property drives both with the same generated records and
  * compares the flat tuples slot by slot.
  */
class CrossPathAgreementSpec extends AnyFunSuite with SparkTestBase {

  private val types = Vector(
    "\"int\"", "\"long\"", "\"double\"", "\"string\"", "\"boolean\"",
    "\"string*\"", "{\"type\":\"array\",\"items\":\"long\"}",
    "{\"type\":\"enum\",\"name\":\"E%d\",\"symbols\":[\"A\",\"B\",\"C\"]}")

  private def randomValue(tpe: String, rnd: Random): Any = tpe match {
    case "\"int\"" => rnd.nextInt()
    case "\"long\"" => rnd.nextLong()
    case "\"double\"" => rnd.nextDouble() * 1e6
    case "\"string\"" => rnd.alphanumeric.take(rnd.nextInt(10)).mkString
    case "\"boolean\"" => rnd.nextBoolean()
    case "\"string*\"" =>
      if (rnd.nextBoolean()) null else rnd.alphanumeric.take(4).mkString
    case t if t.startsWith("{\"type\":\"array") =>
      Seq.fill(rnd.nextInt(4))(rnd.nextLong())
    case _ => Seq("A", "B", "C")(rnd.nextInt(3)) // enum symbol
  }

  /** Slot-level normalization across the two paths' numeric conventions. */
  private def norm(v: Any): Any = v match {
    case i: Int => i.toLong
    case f: Float => f.toDouble
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case x => x
  }

  test("value-path and Column-path flatten produce identical tuples") {
    val rnd = new Random(2026)
    (1 to 12).foreach { trial =>
      val fieldTypes = Vector.fill(1 + rnd.nextInt(5))(
        types(rnd.nextInt(types.length)))
      val fieldsJson = fieldTypes.zipWithIndex.map { case (t, i) =>
        s"""{"name":"f$i","type":${t.replace("%d", s"${trial}_$i")}}"""
      }.mkString(",")
      val schema = Avro.create(
        s"""{"name":"x$trial","type":"record","fields":[$fieldsJson]}""")
      val c = FlattenOps.compile(schema).toOption.get
      val sparkT = SchemaConverters.toStructType(schema, schema.rootRecord)
      val values = (1 to 6).map { _ =>
        fieldTypes.map(t => randomValue(t, rnd))
      }
      // value path: field-name map per record
      val valueFlat = values.map { vs =>
        val m = vs.zipWithIndex.flatMap { case (v, i) =>
          if (v == null) None else Some(s"f$i" -> v)
        }.toMap
        ConvertValue.flatten(c, m)
          .fold(e => fail(s"value flatten failed: $e"), identity)
          .map(norm)
      }.toSet
      // Column path: same records as Rows
      val rows = values.map(vs => Row.fromSeq(vs))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), sparkT)
      val colFlat = c.flatten(df).collect()
        .map(r => r.toSeq.map(norm).toVector).toSet
      assert(colFlat == valueFlat,
        s"paths drifted for schema: $fieldTypes")
    }
  }
}
