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
  * (default 5) timed evaluations; `queries` reports the median and
  * `spread` the per-query {min, med, max} over the timed runs — the
  * spread is what distinguishes a real regression from scheduler noise
  * (single cold/median numbers swung 0.15×–7.9× between rounds on
  * byte-identical code, BENCH_r05 vs r06). `failures` counts queries
  * whose evaluation threw (reported as -1 and excluded from `value`), so
  * a partially-failed bench is distinguishable from a fast one.
  *
  * JVM isolation: by default every query's warmup+runs executes in its
  * OWN forked JVM (`--single <name>` child mode) — the round-8 marathon
  * bench proved a single JVM contaminates late queries with the heap/JIT
  * residue of the ~250 evaluations before them (dedup_ngram med 4.19 s
  * in the marathon vs 1.15–1.59 s isolated), so per-query medians from a
  * shared JVM overstate several queries ~3×. The child inherits this
  * JVM's classpath and --add-opens/-X flags; its one-line sample report
  * rides a marker prefix so Spark log noise cannot corrupt it. Set
  * SPARK_GRAFT_BENCH_FORK=0 for the legacy single-JVM marathon (and the
  * parent falls back to it automatically if the first child cannot even
  * report — e.g. a broken classpath).
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

  // ------------------------------------------------------------- config

  private def sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  // fail fast on unparseable knobs (a silent runs=0 made every query
  // report -1 with a misleading message); runs >= 1, warmups >= 0
  private def envInt(name: String, default: Int, floor: Int): Int =
    sys.env.get(name) match {
      case None => default
      case Some(v) => v.toIntOption.filter(_ >= floor).getOrElse(
        sys.error(s"$name must be an integer >= $floor, got '$v'"))
    }

  private def personRows: Long =
    if (sfDir.contains("0.001")) 20000L
    else if (sfDir.contains("0.01")) 200000L else 2000000L

  private val personNames = Vector("person_validate", "person_flatten",
    "person_roundtrip", "person_to_avro", "person_avro_roundtrip",
    "person_flatten_nocodegen", "person_validate_nocodegen")

  /** Every benchmark name, in report order: declared queries then the
    * Person protocol — known WITHOUT a SparkSession so the forking
    * parent never starts Spark itself.
    */
  private def benchNames: Vector[String] =
    SparkEntry.queries.keys.toVector.sorted ++ personNames

  private def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The timed body for one benchmark name (queries + Person protocol).
    * Person bodies toggle codegen around the evaluation where the
    * protocol calls for it.
    */
  private def benchBody(spark: SparkSession, name: String): () => Unit = {
    if (SparkEntry.queries.contains(name)) { () =>
      sink(SparkEntry.queries(name)(spark, sfDir))
    } else {
      lazy val schema = graft.schema.Avro.create(personJson)
      lazy val compiled =
        FlattenOps.compile(schema).fold(e => sys.error(e), identity)
      lazy val df = personDf(spark, personRows)
      def noCodegen(body: => Unit): Unit = {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        try body
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
      name match {
        case "person_validate" => () => sink(Validate(schema, df))
        case "person_flatten" => () => sink(compiled.flatten(df))
        case "person_roundtrip" =>
          () => sink(compiled.unflatten(compiled.flatten(df)))
        case "person_to_avro" => () =>
          sink(df.select(AvroBinary.toAvroBinary(
            struct(df.columns.map(col).toIndexedSeq: _*), schema)))
        case "person_avro_roundtrip" => () => {
          val allStruct = struct(df.columns.map(col).toIndexedSeq: _*)
          sink(df.select(AvroBinary.fromAvroBinary(
            AvroBinary.toAvroBinary(allStruct, schema), schema)))
        }
        case "person_flatten_nocodegen" =>
          () => noCodegen(sink(compiled.flatten(df)))
        case "person_validate_nocodegen" =>
          () => noCodegen(sink(Validate(schema, df)))
        case other => sys.error(s"unknown benchmark '$other'")
      }
    }
  }

  // ------------------------------------------------------------- timing

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** Warm-up then N timed runs, sorted ascending; a failure yields an
    * EMPTY sample list (reported as -1 + counted in `failures`).
    * CacheScope release between evaluations keeps every run independent
    * AND charges each its full cache-population cost; the image/audio
    * fixture caches — input construction, deliberately outside the timed
    * body — stay warm.
    */
  private def timeSamples(spark: SparkSession, name: String,
      defaultWarmups: Int = 1)(body: => Unit): Seq[Double] = {
    val runs = envInt("SPARK_GRAFT_BENCH_RUNS", 5, floor = 1)
    val warmups = envInt("SPARK_GRAFT_BENCH_WARMUPS", defaultWarmups,
      floor = 0)
    def release(): Unit = graft.pipeline.CacheScope.releaseSession(spark)
    try {
      (1 to warmups).foreach { _ => body; release() }
      (1 to runs).map { _ => val t = time(body); release(); t }.sorted
    } catch { case e: Throwable =>
      System.err.println(s"[bench] $name failed: ${e.getMessage}")
      release()
      Seq.empty
    }
  }

  // conventional median: mean of the two middle samples for even N
  private def median(s: Seq[Double]): Double =
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0

  private def fmt(d: Double): String = // locale-pinned '.' separator
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))

  private def report(
      results: Seq[(String, Seq[Double])], forked: Boolean): Unit = {
    val runs = envInt("SPARK_GRAFT_BENCH_RUNS", 5, floor = 1)
    val warmups = envInt("SPARK_GRAFT_BENCH_WARMUPS",
      if (forked) 2 else 1, floor = 0)
    val medians = results.map { case (k, s) => k -> median(s) }
    val failures = results.count(_._2.isEmpty)
    val qs = (medians.map { case (k, v) => "\"" + k + "\":" + v } ++
        Seq("\"person_rows\":" + personRows.toDouble))
      .mkString("{", ",", "}")
    val spread = results.collect { case (k, s) if s.nonEmpty =>
      s""""$k":{"min":${fmt(s.head)},"med":${fmt(median(s))},"max":${fmt(s.last)}}"""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""spread":$spread,"runs":$runs,"warmups":$warmups,""" +
        s""""failures":$failures,"forked":$forked,"sf":"$sfDir"}"""
    println(json)
    System.err.println(json)
    Files.writeString(Paths.get("BENCH_RESULT.json"), json + "\n")
  }

  // ------------------------------------------------------- child process

  private val ChildMarker = "GRAFT_BENCH_SAMPLES:"

  /** Child mode: time ONE benchmark in this fresh JVM and report the raw
    * samples on a marker line (stdout AND stderr — sbt routes forked
    * stdout through its logger, so the parent scans both).
    */
  private def runSingle(name: String): Unit = {
    val spark = buildSession()
    // 2 warmups by default in a FORKED child: a fresh JVM's first
    // evaluation also pays codegen-compile + JIT staging that the
    // marathon amortized; the second warmup recovers part of that floor
    // (measured: person_flatten med 0.45 -> 0.35 s). A residual
    // ~0.2-0.3 s cold-JVM floor remains on sub-second queries — the
    // price of per-query isolation, documented in BENCH_STABILITY.md.
    // bind the body closure ONCE: its lazy fixtures (person schema
    // compile, generated rows) must initialize during warm-up and stay
    // warm across timed runs — re-invoking benchBody per run would
    // rebuild them inside every sample (r9 review finding; the r8 bench
    // built them once outside the timed body)
    val body = benchBody(spark, name)
    val samples = timeSamples(spark, name, defaultWarmups = 2)(body())
    val line = ChildMarker + samples.map(fmt).mkString("[", ",", "]")
    println(line)
    System.err.println(line)
    Queries.releaseFixtures(spark)
    spark.stop()
  }

  /** JVM flags the child needs: module opens (Spark on JDK 17+) and
    * memory sizing, from this JVM's own arguments.
    */
  private def childJvmFlags: Seq[String] =
    java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).toSeq
      .filter(a => a.startsWith("--add-opens") ||
        a.startsWith("--add-exports") || a.startsWith("-Xm") ||
        a.startsWith("-XX:") || a.startsWith("-Dfile.encoding"))

  /** Spawn `--single name` in its own JVM; None = the child failed to
    * report (crash, timeout, no marker) — distinguished from a reported
    * empty sample list only in stderr noise, both count as failures.
    */
  private def forkOne(name: String): Option[Seq[Double]] = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ childJvmFlags ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench",
        "--single", name)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // drain on a SEPARATE daemon thread: draining on this thread would
    // make the 20-minute timeout unreachable (a hung child never closes
    // stdout, so a blocking read never returns and waitFor is never
    // reached — the exact failure class per-query forking exists to
    // contain); draining after waitFor would deadlock on a full pipe
    // buffer under Spark's log volume. The thread owns the only read.
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try { proc.getInputStream.transferTo(buf); () }
      catch { case _: java.io.IOException => () }
    }, s"bench-drain-$name")
    drain.setDaemon(true)
    drain.start()
    val exited = proc.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
    if (!exited) proc.destroyForcibly()
    drain.join(10000)
    // ByteArrayOutputStream is internally synchronized; join covers the
    // normal-exit case, toByteArray snapshots safely if the drain is
    // somehow still alive after a force-kill
    val out = new String(buf.toByteArray, "UTF-8")
    val marker = out.linesIterator
      .find(_.contains(ChildMarker))
      .map(l => l.substring(
        l.indexOf(ChildMarker) + ChildMarker.length).trim)
    marker match {
      case Some(s) if s.startsWith("[") && s.endsWith("]") =>
        val body = s.drop(1).dropRight(1).trim
        Some(if (body.isEmpty) Seq.empty
          else body.split(',').toSeq.map(_.trim.toDouble))
      case _ =>
        System.err.println(s"[bench] child for $name reported nothing " +
          s"(exit=${if (exited) proc.exitValue() else "timeout"})")
        None
    }
  }

  /** Parent mode: one child JVM per benchmark, sequential (children get
    * the whole machine — parallel children would contend for the same
    * local[32] cores and re-import the noise isolation removes).
    */
  private def runForked(): Unit = {
    val names = benchNames
    val first = forkOne(names.head)
    if (first.isEmpty) {
      // a child that cannot even report means forking itself is broken
      // in this environment — fall back to the single-JVM marathon
      // rather than reporting 100% failures
      System.err.println("[bench] first child failed; falling back " +
        "to in-process mode")
      runAll()
      return
    }
    val results = ((names.head, first.get) +: names.tail.map { n =>
      n -> forkOne(n).getOrElse(Seq.empty)
    }).toSeq
    report(results, forked = true)
  }

  /** Legacy single-JVM marathon (SPARK_GRAFT_BENCH_FORK=0 or fallback). */
  private def runAll(): Unit = {
    val spark = buildSession()
    val results = benchNames.map { n =>
      val body = benchBody(spark, n) // bind once; see runSingle
      n -> timeSamples(spark, n)(body())
    }
    report(results, forked = false)
    Queries.releaseFixtures(spark)
    spark.stop()
  }

  def main(args: Array[String]): Unit = args match {
    case Array("--single", name) => runSingle(name)
    case _ =>
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") == "0") runAll()
      else runForked()
  }
}
