package graft

import graft.ops.{FlattenOps, Validate}
import graft.functions.AvroBinary
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Benchmark main. Two families:
  *  1. every SparkEntry query at SPARK_GRAFT_SF_DIR (full evaluation via
  *     the noop sink — count() would let Catalyst prune the work away)
  *  2. the BASELINE.md Person-schema protocol: validate / flatten /
  *     unflatten / to_avro / from_avro as whole-DataFrame transforms over
  *     generated rows (reference workload: benchmark.lua:3–44)
  * Prints ONE JSON line and also writes it to BENCH_RESULT.json (sbt log
  * prefixes make stdout parsing fragile).
  *
  * Timing protocol: one warm-up evaluation per query (populates codegen
  * caches, JIT, shuffle-file reuse) followed by `SPARK_GRAFT_BENCH_RUNS`
  * (default 3) timed evaluations; the reported number is the median. A
  * single cold measurement on a shared machine swung individual queries
  * 2–24× between rounds on byte-identical code (BENCH_r03 vs r04), so the
  * cold number measures the JVM, not the engine.
  */
object Bench {

  private val personJson = """{"name":"person","type":"record","fields":[
    {"name":"FirstName","type":"string"},{"name":"LastName","type":"string"},
    {"name":"Occupation","type":"string"},{"name":"Title","type":"string"},
    {"name":"Age","type":"long"},
    {"name":"Sex","type":{"type":"enum","name":"Sex",
      "symbols":["FEMALE","MALE"]}},
    {"name":"Stats","type":{"type":"record","name":"Stats","fields":[
      {"name":"Strength","type":"long"},{"name":"Perception","type":"long"},
      {"name":"Endurance","type":"long"},{"name":"Charisma","type":"long"},
      {"name":"Intelligence","type":"long"},{"name":"Agility","type":"long"},
      {"name":"Luck","type":"long"}]}},
    {"name":"Journal","type":{"type":"array","items":"string"}}]}"""

  private def personDf(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("First"), col("id")).as("FirstName"),
      concat(lit("Last"), col("id")).as("LastName"),
      lit("Engineer").as("Occupation"),
      lit("Dr").as("Title"),
      (col("id") % 80 + 18).as("Age"),
      when(col("id") % 2 === 0, "FEMALE").otherwise("MALE").as("Sex"),
      struct((1 to 7).map(i => (col("id") % (i * 10)).as(Seq("Strength",
        "Perception", "Endurance", "Charisma", "Intelligence", "Agility",
        "Luck")(i - 1))): _*).as("Stats"),
      array(lit("entry one"), lit("entry two"), lit("entry three"),
        lit("entry four"), lit("entry five"), lit("entry six")).as("Journal"))

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up then median-of-N; a failed warm-up short-circuits to -1
    def timeMedian(name: String)(body: => Unit): Double =
      try {
        (1 to warmups).foreach(_ => body)
        val samples = (1 to runs).map(_ => time(body)).sorted
        samples(samples.length / 2)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // family 1: the declared queries, fully evaluated
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = timeMedian(name)(sink(fn(spark, sfDir)))
    }

    // family 2: Person protocol (BASELINE.md), n scaled with SF dir
    val n: Long = if (sfDir.contains("0.001")) 20000L
      else if (sfDir.contains("0.01")) 200000L else 2000000L
    val schema = graft.schema.Avro.create(personJson)
    val compiled = FlattenOps.compile(schema).fold(e => sys.error(e), identity)
    val df = personDf(spark, n)
    results("person_validate") = timeMedian("person_validate")(
      sink(Validate(schema, df)))
    results("person_flatten") = timeMedian("person_flatten")(
      sink(compiled.flatten(df)))
    results("person_roundtrip") = timeMedian("person_roundtrip")(
      sink(compiled.unflatten(compiled.flatten(df))))
    val allStruct = struct(df.columns.map(col).toIndexedSeq: _*)
    results("person_to_avro") = timeMedian("person_to_avro")(
      sink(df.select(AvroBinary.toAvroBinary(allStruct, schema))))
    results("person_avro_roundtrip") = timeMedian("person_avro_roundtrip")(
      sink(df.select(AvroBinary.fromAvroBinary(
        AvroBinary.toAvroBinary(allStruct, schema), schema))))
    // optimizer on/off dimension: whole-stage codegen replaces the
    // reference's IL-optimizer toggle (BASELINE.md protocol)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    results("person_flatten_nocodegen") =
      timeMedian("person_flatten_nocodegen")(sink(compiled.flatten(df)))
    results("person_validate_nocodegen") =
      timeMedian("person_validate_nocodegen")(sink(Validate(schema, df)))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    results("person_rows") = n.toDouble

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.filter(_._1.startsWith("person_rows") == false)
      .values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    System.err.println(json)
    Files.writeString(Paths.get("BENCH_RESULT.json"), json + "\n")
    spark.stop()
  }
}
