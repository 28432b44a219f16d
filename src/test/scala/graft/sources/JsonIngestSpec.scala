package graft.sources

import graft.SparkTestBase
import graft.schema.Avro
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSON object-form ingestion vs the reference's copy_data semantics
  * (frontend.lua:857–935; union single-key form :899–919).
  */
class JsonIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("nullable-scalar union: {\"int\": 42} and null") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"v","type":["null","int"]}]}""")
    val df = Seq(
      """{"id": 1, "v": {"int": 42}}""",
      """{"id": 2, "v": null}""",
      """{"id": 3}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select("r.id", "r.v").orderBy("id")
    assert(df.collect().toSeq === Seq(Row(1L, 42), Row(2L, null),
      Row(3L, null)))
  }

  test("general union: single-key object picks the branch, $type$ tagged") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"v","type":["null","int","string"]}]}""")
    val df = Seq(
      """{"id": 1, "v": {"int": 7}}""",
      """{"id": 2, "v": {"string": "hey"}}""",
      """{"id": 3, "v": null}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select(col("r.id"), col("r.v.$type$").as("tag"),
        col("r.v.int").as("iv"), col("r.v.string").as("sv"))
      .orderBy("id")
    assert(df.collect().toSeq === Seq(
      Row(1L, 1, 7, null), Row(2L, 2, null, "hey"), Row(3L, 0, null, null)))
  }

  test("union of named record: tag key is the full name") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"v","type":["int",
          {"name":"Pt","type":"record","fields":[
            {"name":"x","type":"int"},{"name":"y","type":"int"}]}]}]}""")
    val df = Seq(
      """{"v": {"Pt": {"x": 3, "y": 4}}}""",
      """{"v": {"int": 9}}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select(col("r.v.$type$").as("tag"), col("r.v.Pt.x").as("x"),
        col("r.v.int").as("iv"))
      .orderBy("tag")
    assert(df.collect().toSeq === Seq(Row(0, null, 9), Row(1, 3, null)))
  }

  test("namespaced union branches keep their dotted JSON keys") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"v","type":["int",
          {"name":"Rec","namespace":"my","type":"record","fields":[
            {"name":"x","type":"int"}]}]}]}""")
    val df = Seq("""{"v": {"my.Rec": {"x": 5}}}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select(col("r.v.$type$").as("tag"),
        col("r.v.my_Rec.x").as("x"))
    assert(df.collect().toSeq === Seq(Row(1, 5)))
    // egress emits the dotted form back
    val out = Seq("""{"v": {"my.Rec": {"x": 5}}}""").toDF("j")
    val rendered = JsonIngest.ingest(out, s, col("j"))
      .select(JsonIngest.toJsonString(s, col("r")).as("j2"))
      .head().getString(0)
    assert(rendered.contains("\"my.Rec\""), rendered)
  }

  test("missing enum field defaults to its SYMBOL, not the index") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"st","type":{"type":"enum","name":"S",
          "symbols":["A","B"]},"default":"B"}]}""")
    val df = Seq("""{"id": 1}""", """{"id": 2, "st": "A"}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select("r.id", "r.st").orderBy("id")
    assert(df.collect().toSeq === Seq(Row(1L, "B"), Row(2L, "A")))
  }

  test("missing record field takes the schema default") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"src","type":"string","default":"stream"}]}""")
    val df = Seq("""{"id": 1}""", """{"id": 2, "src": "batch"}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select("r.id", "r.src").orderBy("id")
    assert(df.collect().toSeq === Seq(Row(1L, "stream"), Row(2L, "batch")))
  }

  test("arrays and maps of unions recurse") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"xs","type":{"type":"array","items":["null","int"]}},
        {"name":"m","type":{"type":"map","values":["null","long"]}}]}""")
    val df = Seq(
      """{"xs": [{"int": 1}, null, {"int": 3}], "m": {"a": {"long": 5}}}""")
      .toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select(col("r.xs"), map_values(col("r.m")).as("mv"))
    assert(df.collect().toSeq ===
      Seq(Row(Seq(1, null, 3), Seq(5L))))
  }

  test("ingest (single-parse DataFrame form) matches fromJson") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"v","type":["null","int","string"]}]}""")
    val df = Seq(
      """{"id": 1, "v": {"int": 7}}""",
      """{"id": 2, "v": {"string": "hey"}}""",
      """{"id": 3, "v": null}""").toDF("j")
    val a = df.select(JsonIngest.fromJson(s, col("j")).as("r"))
      .select("r.id", "r.v.$type$", "r.v.int", "r.v.string")
      .orderBy("id").collect().toSeq
    val b = JsonIngest.ingest(df, s, col("j"))
      .select("r.id", "r.v.$type$", "r.v.int", "r.v.string")
      .orderBy("id").collect().toSeq
    assert(a === b)
    // the parse must appear exactly once in the optimized plan (use a
    // Range source — LocalRelation input gets fully constant-folded)
    val ranged = spark.range(10).select(concat(lit("{\"id\": "),
      col("id"), lit(", \"v\": {\"int\": 7}}")).as("j"))
    val plan = JsonIngest.ingest(ranged, s, col("j"))
      .select("r.id", "r.v.int", "r.v.string")
      .queryExecution.optimizedPlan.toString
    assert("from_json".r.findAllIn(plan).size == 1, plan)
  }

  test("toJsonString is the inverse of fromJson (object-form round-trip)") {
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"v","type":["null","int","string"]},
        {"name":"nv","type":["null","double"]},
        {"name":"xs","type":{"type":"array","items":"int"}}]}""")
    val inputs = Seq(
      """{"id":1,"v":{"int":7},"nv":{"double":1.5},"xs":[1,2]}""",
      """{"id":2,"v":{"string":"hey"},"nv":null,"xs":[]}""",
      """{"id":3,"v":null,"nv":null,"xs":[9]}""")
    val df = inputs.toDF("j")
    val round = JsonIngest.ingest(df, s, col("j"))
      .select(JsonIngest.toJsonString(s, col("r")).as("j2"))
    // re-ingesting the rendered JSON must reproduce the internal rows
    val first = JsonIngest.ingest(df, s, col("j")).select("r")
      .orderBy("r.id").collect().toSeq
    val second = JsonIngest.ingest(round, s, col("j2")).select("r")
      .orderBy("r.id").collect().toSeq
    assert(first === second)
    // spot-check the single-key union rendering
    val rendered = round.orderBy("j2").collect().map(_.getString(0))
    assert(rendered.exists(_.contains("\"v\":{\"int\":7}")),
      rendered.mkString("; "))
    assert(rendered.exists(_.contains("\"v\":{\"string\":\"hey\"}")),
      rendered.mkString("; "))
  }

  test("ingest works on a stream (readStream JSON → internal form)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = Avro.create(
      """{"name":"r","type":"record","fields":[
        {"name":"id","type":"long"},
        {"name":"v","type":["null","int","string"]}]}""")
    val input = MemoryStream[String](spark)
    input.addData(
      """{"id": 1, "v": {"int": 7}}""",
      """{"id": 2, "v": {"string": "hey"}}""")
    val out = JsonIngest.ingest(input.toDF().toDF("j"), s, col("j"))
      .select(col("r.id"), col("r.v.$type$").as("tag"))
    val q = out.writeStream.format("memory").queryName("json_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("json_stream").orderBy("id").collect().toSeq ===
      Seq(Row(1L, 1), Row(2L, 2)))
  }

  test("ingested rows feed flatten (end-to-end with FlattenOps)") {
    val s = Avro.create(
      """{"name":"ev","type":"record","fields":[
        {"name":"event_id","type":"long"},
        {"name":"pv","type":["null","int","string"]}]}""")
    val c = graft.ops.FlattenOps.compile(s, s).fold(e => fail(e), identity)
    val df = Seq(
      """{"event_id": 1, "pv": {"int": 5}}""",
      """{"event_id": 2, "pv": {"string": "x"}}""").toDF("j")
      .select(JsonIngest.fromJson(s, col("j")).as("r")).select("r.*")
    val flat = c.flatten(df)
    assert(flat.count() === 2)
  }
}
