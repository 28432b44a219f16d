package graft.sources

import graft.SparkTestBase
import graft.schema.Avro
import org.apache.avro.generic.{GenericData, GenericDatumWriter,
  GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

class AvroFilesSpec extends AnyFunSuite with SparkTestBase {

  private val writerJson =
    """{"name":"ev","type":"record","fields":[
      {"name":"event_id","type":"long"},
      {"name":"event_type","type":"string"},
      {"name":"value","type":"double"}]}"""

  private def writeContainer(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, String, Double)]): Unit = {
    val js = new org.apache.avro.Schema.Parser().parse(writerJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](js))
    w.create(js, dir.resolve(name).toFile)
    rows.foreach { case (id, t, v) =>
      val r = new GenericData.Record(js)
      r.put("event_id", id)
      r.put("event_type", t)
      r.put("value", v)
      w.append(r)
    }
    w.close()
  }

  test("reads container files with reader-schema evolution") {
    val dir = java.nio.file.Files.createTempDirectory("avrofiles")
    writeContainer(dir, "a.avro", Seq((1L, "click", 1.5), (2L, "view", 2.5)))
    writeContainer(dir, "b.avro", Seq((3L, "buy", 3.5)))
    val writer = Avro.create(writerJson)
    val reader = Avro.create(
      """{"name":"ev","type":"record","fields":[
        {"name":"event_id","type":"long"},
        {"name":"etype","type":"string","aliases":["event_type"]},
        {"name":"value","type":"double"},
        {"name":"source","type":"string","default":"file"}]}""")
    val df = AvroFiles.read(spark, dir.toString, writer, reader)
      .select("r.event_id", "r.etype", "r.source")
      .orderBy("event_id")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "click")
    assert(rows.forall(_.getString(2) == "file")) // default filled
  }

  test("streaming read: container files arriving in waves equal batch read") {
    val dir = java.nio.file.Files.createTempDirectory("avrofiles_stream")
    val writer = Avro.create(writerJson)
    val reader = Avro.create(
      """{"name":"ev","type":"record","fields":[
        {"name":"event_id","type":"long"},
        {"name":"etype","type":"string","aliases":["event_type"]},
        {"name":"value","type":"double"},
        {"name":"source","type":"string","default":"file"}]}""")
    val q = AvroFiles.readStream(spark, dir.toString, writer, reader)
      .select("r.event_id", "r.etype", "r.value", "r.source")
      .writeStream.format("memory").queryName("avro_file_stream")
      .outputMode("append").start()
    writeContainer(dir, "w1.avro",
      Seq((1L, "click", 1.5), (2L, "view", 2.5)))
    q.processAllAvailable() // wave 1 = micro-batch 1
    writeContainer(dir, "w2.avro", Seq((3L, "buy", 3.5)))
    q.processAllAvailable() // wave 2 = micro-batch 2
    q.stop()
    val streamed = spark.table("avro_file_stream")
      .orderBy("event_id").collect().map(_.toSeq.toList).toList
    val batch = AvroFiles.read(spark, dir.toString, writer, reader)
      .select("r.event_id", "r.etype", "r.value", "r.source")
      .orderBy("event_id").collect().map(_.toSeq.toList).toList
    assert(streamed == batch, s"$streamed != $batch")
    assert(streamed.length == 3 &&
      streamed.forall(_.last == "file")) // default filled on the stream
  }

  test("schema mismatch fails with both spellings") {
    val dir = java.nio.file.Files.createTempDirectory("avrofiles2")
    writeContainer(dir, "a.avro", Seq((1L, "x", 0.5)))
    val other = Avro.create(
      """{"name":"other","type":"record","fields":[
        {"name":"k","type":"long"}]}""")
    val e = intercept[Exception] {
      AvroFiles.read(spark, dir.toString, other, other).collect()
    }
    assert(e.getMessage.contains("does not match") ||
      e.getCause != null, e.getMessage)
  }
}
