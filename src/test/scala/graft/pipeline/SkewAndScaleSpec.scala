package graft.pipeline

import graft.SparkTestBase
import graft.schema.Avro
import graft.ops.FlattenOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of rows share one hot key
    val big = spark.range(10000).select(
      when($"id" % 10 === 0, $"id" % 5).otherwise(lit(42L)).as("k"),
      $"id".as("v"))
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e")).toDF("k", "name")
    val expected = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == expected.count())
    assert(salted.agg(expr("bit_xor(xxhash64(k, v, name))")).head() ==
      expected.agg(expr("bit_xor(xxhash64(k, v, name))")).head())
  }

  test("twoPhaseAgg equals direct aggregation") {
    val df = spark.range(20000).select(
      when($"id" % 100 === 0, $"id" % 7).otherwise(lit(1L)).as("k"),
      $"id".as("v"))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy("k").collect()
    val twoPhase = Skew.twoPhaseAgg(df, "k", salts = 16,
      partial = Seq(count(lit(1)).as("pn"), sum($"v").as("ps")),
      merge = Seq(sum($"pn").as("n"), sum($"ps").as("s")))
      .orderBy("k").collect()
    assert(twoPhase.toSeq == direct.toSeq)
  }

  test("enum_large: 1000-symbol enum flattens via map literal (F6)") {
    val symbols = (0 until 1000).map(i => s"SYM_$i")
    val schema = Avro.create(
      s"""{"name":"r","type":"record","fields":[{"name":"e","type":
        {"type":"enum","name":"Big","symbols":[${symbols.map("\"" + _ + "\"")
          .mkString(",")}]}}]}""")
    val c = FlattenOps.compile(schema).toOption.get
    val df = Seq("SYM_0", "SYM_999", "SYM_500").toDF("e")
    val got = c.flatten(df).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 999, 500))
    // round-trip through unflatten
    val back = c.unflatten(c.flatten(df)).collect().map(_.getString(0)).toSeq
    assert(back == Seq("SYM_0", "SYM_999", "SYM_500"))
  }

  test("promotion corpus: every legal direction, every illegal rejected (F7)") {
    val types = Seq("int", "long", "float", "double", "string", "bytes")
    val legal = Set(("int", "long"), ("int", "float"), ("int", "double"),
      ("long", "float"), ("long", "double"), ("float", "double"),
      ("string", "bytes"), ("bytes", "string"))
    for (from <- types; to <- types if from != to) {
      val w = Avro.create(s""""$from"""")
      val r = Avro.create(s""""$to"""")
      val res = Avro.areCompatible(w, r)
      if (legal((from, to))) assert(res.isRight, s"$from->$to should promote")
      else {
        assert(res == Left(s"Types incompatible: $from and $to"),
          s"$from->$to should be rejected")
      }
    }
  }
}
