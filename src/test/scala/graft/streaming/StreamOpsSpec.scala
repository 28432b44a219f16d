package graft.streaming

import graft.SparkTestBase
import graft.schema.Avro
import graft.ops.FlattenOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def processAll(df: org.apache.spark.sql.DataFrame,
      name: String, mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("flatten + validate on a stream behave like batch") {
    val w = Avro.create("""{"name":"e","type":"record","fields":[
      {"name":"event_id","type":"long"},
      {"name":"event_type","type":"string"}]}""")
    val r = Avro.create("""{"name":"e","type":"record","fields":[
      {"name":"etype","type":"string","aliases":["event_type"]},
      {"name":"event_id","type":"long"},
      {"name":"chan","type":"string","default":"s"}]}""")
    val c = FlattenOps.compile(w, r).toOption.get
    val input = MemoryStream[(Long, String)](spark)
    input.addData((1L, "click"), (2L, "view"))
    val stream = input.toDF().toDF("event_id", "event_type")
    val out = processAll(StreamOps.flattenStream(c, stream), "flat_stream")
    assert(out.columns.toSeq == Seq("etype", "event_id", "chan"))
    assert(out.orderBy("event_id").collect().map(_.toSeq.toList).toList ==
      List(List("click", 1L, "s"), List("view", 2L, "s")))
  }

  test("windowed stats with watermark aggregate per window+key") {
    val input = MemoryStream[(Timestamp, Long, Double)](spark)
    val t0 = Timestamp.valueOf("2026-01-01 00:00:10")
    val t1 = Timestamp.valueOf("2026-01-01 00:00:30")
    val t2 = Timestamp.valueOf("2026-01-01 00:01:30")
    input.addData((t0, 1L, 2.0), (t1, 1L, 3.0), (t2, 1L, 5.0))
    val stream = input.toDF().toDF("ts", "user_id", "value")
    val out = processAll(StreamOps.windowedStats(stream, "ts", "user_id",
      "value"), "win_stream", mode = "complete")
    val rows = out.select("n_events", "sum_value")
      .orderBy("n_events").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 5.0), (2L, 5.0)))
  }

  test("running per-key state across micro-batches") {
    val input = MemoryStream[(Long, Double)](spark)
    val stream = input.toDF().toDF("user_id", "value")
    val q = StreamOps.runningPerKey(stream, "user_id", "value")
      .writeStream.format("memory").queryName("state_stream")
      .outputMode("append").start()
    input.addData((7L, 1.0), (7L, 2.0), (8L, 10.0))
    q.processAllAvailable()
    input.addData((7L, 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_stream")
      .orderBy("key", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(rows == List((7L, 2L, 3.0), (7L, 3L, 7.0), (8L, 1L, 10.0)))
  }
}
