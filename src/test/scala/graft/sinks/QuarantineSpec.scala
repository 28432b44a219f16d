package graft.sinks

import graft.SparkTestBase
import graft.ops.Validate
import graft.schema.Avro
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuarantineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = Avro.create(
    """{"name":"r","type":"record","fields":[
      {"name":"id","type":"long"},
      {"name":"st","type":{"type":"enum","name":"S",
        "symbols":["A","B"]}}]}""")

  test("split routes invalid rows with their error") {
    val df = Seq((1L, "A"), (2L, "Z"), (3L, "B")).toDF("id", "st")
    val (good, quarantined) = Quarantine.split(Validate(schema, df))
    assert(good.columns.toSeq == Seq("id", "st"))
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val q = quarantined.select("id", "_error").collect()
    assert(q.length == 1 && q(0).getLong(0) == 2L)
    assert(q(0).getString(1) == "st: Bad value: \"Z\"")
  }

  test("writeStreamPartitioned routes a stream into good/quarantine") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    input.addData((1L, "A"), (2L, "Z"), (3L, "B"), (4L, "Q"))
    val stream = input.toDF().toDF("id", "st")
    val base = java.nio.file.Files
      .createTempDirectory("quarantine-stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("quarantine-ckpt").toString
    val q = Quarantine.writeStreamPartitioned(
      Validate(schema, stream), base, ckpt)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(Quarantine.goodPath(base)).count() == 2)
    val bad = spark.read.parquet(Quarantine.quarantinePath(base))
    assert(bad.count() == 2)
    assert(bad.filter(col("_error").isNull).count() == 0)
  }

  test("writePartitioned splits in one scan; both sides read back") {
    val df = Seq((1L, "A"), (2L, "Z"), (3L, "B"), (4L, "Q"))
      .toDF("id", "st")
    val base = java.nio.file.Files
      .createTempDirectory("quarantine").toString
    Quarantine.writePartitioned(Validate(schema, df), base)
    val good = spark.read.parquet(Quarantine.goodPath(base))
    val bad = spark.read.parquet(Quarantine.quarantinePath(base))
    assert(good.count() == 2)
    assert(bad.count() == 2)
    assert(bad.columns.contains("_error"))
    assert(bad.filter(col("_error").isNull).count() == 0)
  }
}
