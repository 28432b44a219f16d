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
  * JVM isolation: multi-second entries execute in their OWN forked JVM
  * (entries with NO committed prior pack into shared light bins at a
  * conservative 1.25 s estimate — a surprise heavy inflates its bin's
  * wall clock, never its data, and earns a solo slot next round once
  * its prior lands) — the round-8 marathon bench
  * proved a single JVM contaminates late queries with the heap/JIT
  * residue of the ~250 evaluations before them (dedup_ngram med 4.19 s
  * in the marathon vs 1.15–1.59 s isolated), so multi-second medians
  * from a shared JVM overstate ~3×. Sub-second entries PACK into small
  * shared-JVM bins (`--multi` child mode, bounded eval seconds + entry
  * count): at r12 the one-JVM-per-query protocol's 121 × (JVM + Spark
  * startup + warmups) fixed cost outgrew the driver's gate timeout and
  * — because nothing was reported until the very end — produced zero
  * output two rounds running. The parent now also REWRITES the
  * cumulative BENCH_RESULT.json after every child, so any abort still
  * leaves a parseable artifact. Children inherit this JVM's classpath
  * and --add-opens/-X flags; marker-prefixed per-entry report lines
  * keep Spark log noise out of the protocol. Set
  * SPARK_GRAFT_BENCH_FORK=0 for the legacy single-JVM marathon (and the
  * parent falls back to it automatically if the first child cannot even
  * report — e.g. a broken classpath).
  */
object Bench {

  /** Process start, for the report's `elapsed_sec` — the wall-clock
    * evidence that the run fit (or didn't fit) the driver gate, kept
    * next to `planned`/`completed`/`partial` so a report is auditable
    * without the run's stderr.
    */
  private val processStartNanos = System.nanoTime()

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
    * parent never starts Spark itself. SPARK_GRAFT_BENCH_ONLY is a
    * dev-only comma-separated subset filter (the driver never sets it,
    * so the gate always times the full inventory).
    */
  private def benchNames: Vector[String] = {
    val all = SparkEntry.queries.keys.toVector.sorted ++ personNames
    sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .map(only => all.filter(only)).getOrElse(all)
  }

  // ------------------------------------------------- priors + bin plan

  /** Per-benchmark (min, med, max) timings from the COMMITTED
    * BENCH_RESULT.json of the previous run, parsed with a regex so the
    * parent stays dependency-free (the spread entries are the only
    * objects with exactly these three keys). Priors drive the bin plan
    * and per-entry run counts only — never any reported number — so a
    * stale or absent prior can cost time, not correctness.
    */
  private def priorSpreads: Map[String, (Double, Double, Double)] = {
    val p = Paths.get("BENCH_RESULT.json")
    if (!Files.exists(p)) Map.empty
    else {
      val txt = Files.readString(p)
      // whitespace-tolerant: Bench writes the spread compactly, but a
      // merged/pretty-printed priors file (e.g. the r17 closing-session
      // merge) carries ": " — the strict regex silently parsed ZERO
      // priors from it and degraded the whole bin plan to no-prior
      // estimates
      val re = ("\"([A-Za-z0-9_]+)\"\\s*:\\s*\\{\\s*\"min\"\\s*:\\s*" +
        "(-?[0-9.]+)\\s*,\\s*\"med\"\\s*:\\s*(-?[0-9.]+)\\s*,\\s*" +
        "\"max\"\\s*:\\s*(-?[0-9.]+)\\s*\\}").r
      re.findAllMatchIn(txt).map(m => m.group(1) ->
        ((m.group(2).toDouble, m.group(3).toDouble, m.group(4).toDouble)))
        .toMap
    }
  }

  /** Timed runs for one benchmark: the env override wins globally;
    * otherwise 3 runs when the previous run's spread was tight
    * (max/min <= 1.2 — the sample count buys nothing there) and the
    * default 5 when it was noisy or the entry has no prior.
    */
  private def runsFor(name: String,
      priors: Map[String, (Double, Double, Double)]): Int =
    sys.env.get("SPARK_GRAFT_BENCH_RUNS") match {
      case Some(_) => envInt("SPARK_GRAFT_BENCH_RUNS", 5, floor = 1)
      case None => priors.get(name) match {
        // solo-tier entries: 2 timed runs (median = their mean) — they
        // execute in the cleanest environment (own JVM, 2 warmups
        // already demonstrating stability) and a 3rd 6-second sample
        // tightens a seconds-wide median by ~nothing; the r14-w1 run
        // spent ~80 s on exactly those third samples
        case Some((_, med, _)) if med >= 4.0 => 2
        case Some((mn, _, mx)) if mn > 0 && mx / mn <= 1.2 => 3
        // multi-second entries: 3 timed runs — the extra 2 samples
        // tighten a median that is already seconds wide by ~nothing
        // and cost ~10 s each across the heavy tail
        case Some((_, med, _)) if med >= 2.0 => 3
        case _ => 5
      }
    }

  /** The forked execution plan: one child JVM per BIN of benchmarks,
    * three isolation tiers by prior median:
    *
    *  - `>= soloCut` (true heavies): a JVM each — isolation matters
    *    exactly where heap/JIT residue can move a multi-second median
    *    (the r8 marathon lesson).
    *  - `[heavyCut, soloCut)`: SMALL bins (<= maxHeavyBinSize) — the
    *    full r12-era solo treatment for this 2.5-4.5 s tier cost ~21
    *    children x (startup + fixtures + warmups) and pushed the full
    *    run past the gate timeout; 2-3 per JVM keeps residue exposure
    *    bounded while halving the fixed cost.
    *  - below (incl. NO-prior entries at a conservative 1.25 s
    *    estimate): packs greedily (longest-first) into bins bounded by
    *    estimated eval seconds AND entry count, so the ~12-18 s
    *    JVM+Spark startup amortizes over a dozen sub-second queries
    *    instead of being paid 124 times (the r12 gate timeout was 121
    *    children x fixed cost with zero partial output). A surprise
    *    heavy inflates one bin's RUNTIME, never its data — each bin
    *    entry reports on its own marker line, so completed siblings
    *    survive.
    *
    * Order: light packed bins FIRST (they carry ~3/4 of the entry
    * count for ~1/4 of the wall clock, so a worst-case cut still
    * yields a broad artifact), then the ENTIRE multi-second tier
    * (solos and heavy bins interleaved) in strictly DECREASING prior
    * cost — a deadline cut therefore drops the cheapest multi-second
    * entries (the ~2.5 s tier, whose sub-second family twins are
    * already timed) and never the heaviest, most regression-prone
    * evidence (the r13 cut lost exactly that tier because heavy bins
    * ran dead last).
    *
    * Each planned entry also carries its warm-up CEILING: entries with
    * a prior median >= heavyCut warm at most 3 times (their first
    * evaluation already runs the full plan through codegen; 8 adaptive
    * warmups on a 5 s entry was ~40 s of warm-up for a stability the
    * 3rd warmup already demonstrates — the single largest avoidable
    * cost in the r13 over-deadline run), everything else keeps the
    * adaptive ceiling of 8.
    */
  private def binPlan(priors: Map[String, (Double, Double, Double)],
      heavyCut: Double = 2.0, soloCut: Double = 6.0,
      binEvalBudgetSec: Double = 75.0, maxBinSize: Int = 12,
      heavyBinBudgetSec: Double = 120.0, maxHeavyBinSize: Int = 3)
      : Vector[Vector[(String, Int, Int)]] = {
    // soloCut 6.0 (was 4.0): the r14-w2 run spent ~500 s of pure
    // JVM+Spark startup on 18 solo children; the 4-6 s tier shares
    // 3-per-bin children instead (bin-mates at this size showed no
    // residue distortion in w2 — e.g. the span family bin matched its
    // solo-era priors within noise), keeping isolation for the true
    // heavies only.
    // heavyCut 2.0 (was 2.5): the r14-w1 first light bin packed three
    // ~2-2.4 s entries with nine sub-second ones and residue inflated
    // one of them 4.6x (audio_dedup_pairs 2.0 -> 9.2 s) — a corrupted
    // prior that then mis-tiers the NEXT run too. The 2.0-2.5 s family
    // belongs in the small heavy bins (3 per JVM keeps the fixed cost
    // amortized).
    val warmEst = 3 // typical adaptive warmups per entry in a warm JVM
    val noPriorEstSec = 1.25
    def med(n: String): Double =
      priors.get(n).map(_._2).getOrElse(noPriorEstSec)
    val names = benchNames
    val (solo, rest) = names.partition(n => med(n) >= soloCut)
    val (heavy, light) = rest.partition(n => med(n) >= heavyCut)
    // Warm-up ceilings by what a warmup actually buys:
    //  - stream entries: 2 — the r14-w2 try at 1 under-warmed the
    //    heavy streams badly (span_stream 8.1 -> 16.6 s, minhash_stream
    //    6.2 -> 11.7: the first post-warmup evaluation still pays
    //    state-store + per-restart setup); the second warmup absorbs
    //    that. Beyond 2, extra warmups only replay micro-batch
    //    scheduling.
    //  - solo/heavy multi-second tier: 2 — first eval compiles the
    //    plan, the second demonstrates stability; 3 warmups on a 6 s
    //    entry was ~40 s of the r14-w1 wall clock.
    //  - light: 6 (was 8) — an entry the 10% band hasn't stabilized by
    //    6 warmups rarely stabilizes by 8; the floor of 5 for
    //    sub-second entries still applies inside timeSamples.
    def warmCap(n: String): Int =
      if (n.contains("stream")) 2
      else if (med(n) >= heavyCut) 2
      else 6
    // family-affinity first-fit: entries sort by (operator family,
    // cost desc) and fill bins in that order, so queries sharing a
    // per-session fixture (the minhash/simhash/image/… index builds,
    // stream inputs, planted blob corpora) land in the SAME child and
    // build it once — cross-family bins were rebuilding several
    // indexes per JVM, a larger fixed cost than the JVM startup itself
    def family(n: String): String =
      n.stripPrefix("sql_").split('_').head
    def pack(entries: Vector[String], budgetSec: Double,
        maxSize: Int): Vector[Vector[(String, Int, Int)]] = {
      val bins = scala.collection.mutable.ArrayBuffer
        .empty[(scala.collection.mutable.ArrayBuffer[(String, Int, Int)],
          Double)]
      entries.map(n => (n, med(n), runsFor(n, priors)))
        .sortBy { case (n, m, _) => (family(n), -m) }
        .foreach { case (n, m, runs) =>
          val cost = (math.min(warmEst, warmCap(n)) + runs) * m
          // prefer the LAST open bin (the family neighborhood);
          // fall back to any bin with room
          val open = bins.lastOption.filter { case (b, c) =>
            b.size < maxSize && c + cost <= budgetSec
          }.orElse(bins.find { case (b, c) =>
            b.size < maxSize && c + cost <= budgetSec
          })
          open match {
            case Some(bin @ (b, c)) =>
              b += ((n, runs, warmCap(n)))
              bins.update(bins.indexOf(bin), (b, c + cost))
            case None =>
              bins += ((scala.collection.mutable
                .ArrayBuffer((n, runs, warmCap(n))), cost))
          }
        }
      bins.map(_._1.toVector).toVector
    }
    val soloBins = solo.sortBy(n => -med(n))
      .map(n => Vector((n, runsFor(n, priors), warmCap(n))))
    // light bins first (breadth under any cut), then the whole
    // multi-second tier in decreasing prior cost — heaviest evidence
    // earliest, so a deadline cut drops the cheapest mid-tier entries
    val multiSecond = (soloBins ++ pack(heavy, heavyBinBudgetSec,
      maxHeavyBinSize)).sortBy(b => -b.map(e => med(e._1)).max)
    (pack(light, binEvalBudgetSec, maxBinSize) ++ multiSecond).toVector
  }

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

  /** One benchmark's measured protocol: sorted timed samples plus the
    * telemetry that makes an outlier explainable — how many warmups the
    * adaptive rule actually ran, total GC seconds across the timed runs,
    * and the worst single run's GC seconds (a max-sample spike whose GC
    * share is large is heap mode, not plan variance — the r9
    * `simhash_index_documents` 3.4× spread hypothesis).
    */
  private case class BenchSample(samples: Seq[Double], warmups: Int,
      gcTotalSec: Double, gcMaxRunSec: Double)

  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum
  }

  /** Adaptive warm-up then N timed runs, sorted ascending; a failure
    * yields an EMPTY sample list (reported as -1 + counted in
    * `failures`). CacheScope release between evaluations keeps every run
    * independent AND charges each its full cache-population cost; the
    * image/audio fixture caches — input construction, deliberately
    * outside the timed body — stay warm.
    *
    * Warm-up rule (r9 verdict: 2 fixed warmups under-warmed ~15
    * sub-second queries 1.8–2.2× in a fresh forked JVM): always run the
    * floor (env / default), then KEEP warming while the last two warm-up
    * times still disagree by >20% or a sub-second query has had fewer
    * than 5 warmups — bounded by 8 warmups and a 45 s cumulative
    * warm-up budget. The budget is sized so even the multi-second
    * queries warm to stability (simhash_index probe: warmups 8→3.4→3.1 s
    * then steady ~2.8 — a 10 s budget would stop after the 8 s first
    * evaluation and leave the timed med ~1.7× above steady state).
    */
  private def timeSamples(spark: SparkSession, name: String,
      defaultWarmups: Int = 1, runsOverride: Option[Int] = None,
      subSecondWarmFloor: Int = 5, maxWarmupsCap: Int = 8)
      (body: => Unit): BenchSample = {
    val runs = runsOverride.getOrElse(
      envInt("SPARK_GRAFT_BENCH_RUNS", 5, floor = 1))
    // the per-entry ceiling wins over the floor: a stream entry capped
    // at 1 warmup must not be re-floored to 2 by the forked default
    val floor = math.min(maxWarmupsCap,
      envInt("SPARK_GRAFT_BENCH_WARMUPS", defaultWarmups, floor = 0))
    val maxWarmups = maxWarmupsCap
    val warmBudgetSec = 45.0
    def release(): Unit = graft.pipeline.CacheScope.releaseSession(spark)
    try {
      var warm = List.empty[Double] // most recent first
      var cum = 0.0
      // 10% band: at 20% the multi-second queries stopped after 3
      // warmups while their timed samples were still trending down
      // ~10%/run (C2 still compiling) — the tighter band buys 1-2 more
      // warmups exactly when the trend is real and exits on genuine
      // plateaus
      def stable: Boolean = warm match {
        case a :: b :: _ => math.max(a, b) / math.min(a, b).max(1e-9) <= 1.1
        case _ => false
      }
      def more: Boolean =
        warm.length < floor ||
          (cum < warmBudgetSec && warm.length < maxWarmups &&
            (!stable || (warm.headOption.exists(_ < 1.0) &&
              warm.length < subSecondWarmFloor)))
      while (more) {
        val t = time(body); release(); cum += t; warm ::= t
      }
      // surprise-heavy guard: a NO-PRIOR entry plans 5 runs on a
      // 1.25 s estimate; if its warmups reveal a multi-second reality
      // (min over warmups — the steadiest evaluation, so a one-off
      // fixture-build first warmup can't demote a genuinely light
      // entry), drop to the run count its tier would have planned
      // (r14-w1: bm25_stream_index at 8 s x 5 planned runs was 64 s
      // for one entry)
      val steadiest = if (warm.isEmpty) 0.0 else warm.min
      val runsEff =
        if (steadiest >= 4.0) math.min(runs, 2)
        else if (steadiest >= 2.0) math.min(runs, 3)
        else runs
      var gcTotal = 0.0
      var gcMaxRun = 0.0
      val samples = (1 to runsEff).map { _ =>
        val g0 = gcMillis
        val t = time(body)
        val g = (gcMillis - g0) / 1e3
        release()
        gcTotal += g; gcMaxRun = math.max(gcMaxRun, g)
        t
      }.sorted
      BenchSample(samples, warm.length, gcTotal, gcMaxRun)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] $name failed: ${e.getMessage}")
      release()
      BenchSample(Seq.empty, 0, 0.0, 0.0)
    }
  }

  // conventional median: mean of the two middle samples for even N
  private def median(s: Seq[Double]): Double =
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0

  private def fmt(d: Double): String = // locale-pinned '.' separator
    String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))

  /** Render + persist the report. Called INCREMENTALLY after every
    * child completes (`partial = true`: BENCH_RESULT.json only, so a
    * gate timeout leaves a parseable prefix instead of nothing — the
    * r11/r12 lesson, two rounds of rc=124 with zero captured output)
    * and once at the end (`partial = false`: the one stdout/stderr
    * line the driver parses, unchanged contract). Every write is a
    * complete well-formed JSON object covering the entries finished so
    * far; `planned` vs `completed` says how far the run got.
    */
  private def report(results: Seq[(String, BenchSample)], forked: Boolean,
      planned: Int, partial: Boolean, emit: Boolean = false): Unit = {
    val runs = envInt("SPARK_GRAFT_BENCH_RUNS", 5, floor = 1)
    val warmups = envInt("SPARK_GRAFT_BENCH_WARMUPS",
      if (forked) 2 else 1, floor = 0)
    val medians = results.map { case (k, b) => k -> median(b.samples) }
    val failures = results.count(_._2.samples.isEmpty)
    val qs = (medians.map { case (k, v) => "\"" + k + "\":" + v } ++
        Seq("\"person_rows\":" + personRows.toDouble))
      .mkString("{", ",", "}")
    val spread = results.collect { case (k, b) if b.samples.nonEmpty =>
      s""""$k":{"min":${fmt(b.samples.head)},"med":${fmt(median(b.samples))},"max":${fmt(b.samples.last)}}"""
    }.mkString("{", ",", "}")
    // per-query protocol telemetry: timed runs, adaptive warmups
    // actually run, GC seconds over the timed runs, worst single run's
    // GC seconds — what distinguishes a heap-mode outlier from a plan
    // regression
    val meta = results.collect { case (k, b) if b.samples.nonEmpty =>
      s""""$k":{"runs":${b.samples.length},"warmups":${b.warmups},""" +
        s""""gc_total_sec":${fmt(b.gcTotalSec)},""" +
        s""""gc_max_run_sec":${fmt(b.gcMaxRunSec)}}"""
    }.mkString("{", ",", "}")
    val total = medians.map(_._2).filter(_ >= 0).sum
    val tail =
      s""""runs":$runs,""" +
        s""""warmups":$warmups,"failures":$failures,"forked":$forked,""" +
        s""""planned":$planned,"completed":${results.size},""" +
        s""""partial":$partial,""" +
        s""""elapsed_sec":${(System.nanoTime() - processStartNanos) / 1000000000L},""" +
        s""""sf":"$sfDir"}"""
    val head =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"""
    // the stdout CONTRACT LINE carries only what the driver's parser
    // reads (queries/planned/completed/partial/total) — the per-query
    // spread and GC telemetry inflated the one line past the driver's
    // capture window (BENCH_r14.json parsed:null with the tail showing
    // a mid-line cut), so they now live in BENCH_RESULT.json only
    val contractLine = head + tail
    val fullJson = head + s""""spread":$spread,"meta":$meta,""" + tail
    // `emit` (final call) prints the one driver-contract line; `partial`
    // is the HONESTY flag — true whenever completed < planned, even on
    // the final report (the r13 deadline cut dropped 23 entries yet
    // stamped partial:false, so a consumer had no signal the heavy tier
    // was absent)
    //
    // STDOUT gets EXACTLY ONE JSON line (r17; sixth attempt at a
    // non-null driver parse). History: the full 190-entry queries dict
    // overflows the driver's line-capture window (r14/r15 tails cut
    // mid-dict), and r16's compact line APPENDED after the full line
    // still parsed null — the captured tail ended inside the FIRST
    // line, so the driver evidently keeps the first `{"metric"…` match,
    // truncated. Hence: one line only, with a BOUNDED queries dict (the
    // 8 most expensive medians — the contract shape, window-safe at
    // <~700 bytes). The full per-query data lives in BENCH_RESULT.json
    // and on stderr.
    val topQ = (medians.filter(_._2 >= 0).sortBy(-_._2).take(8)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v) } ++
        Seq("\"person_rows\":" + personRows.toDouble))
      .mkString("{", ",", "}")
    val compactLine =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""queries":$topQ,""" +
        s""""planned":$planned,"completed":${results.size},""" +
        s""""partial":$partial,"failures":$failures,""" +
        s""""elapsed_sec":${(System.nanoTime() - processStartNanos) / 1000000000L},""" +
        s""""sf":"$sfDir"}"""
    if (emit) {
      println(compactLine)
      System.err.println(contractLine)
      System.err.println(compactLine)
    }
    Files.writeString(Paths.get("BENCH_RESULT.json"), fullJson + "\n")
  }

  // ------------------------------------------------------- child process

  private val ChildMarker = "GRAFT_BENCH_SAMPLES:"
  private val ChildMetaMarker = "GRAFT_BENCH_META:"

  /** Child mode: time ONE benchmark in this fresh JVM and report the raw
    * samples on a marker line (stdout AND stderr — sbt routes forked
    * stdout through its logger, so the parent scans both), plus a second
    * marker with the protocol telemetry (adaptive warmup count, GC time).
    */
  private def runSingle(name: String): Unit = {
    val spark = buildSession()
    // floor of 2 warmups in a FORKED child: a fresh JVM's first
    // evaluation also pays codegen-compile + JIT staging that the
    // marathon amortized; the adaptive rule in timeSamples then keeps
    // warming sub-second queries (up to 8 / 10 s cumulative) until two
    // consecutive warmups agree within 20% — the r9 protocol's fixed 2
    // left a ~2× cold-JIT tax on ~15 sub-second entries.
    // bind the body closure ONCE: its lazy fixtures (person schema
    // compile, generated rows) must initialize during warm-up and stay
    // warm across timed runs — re-invoking benchBody per run would
    // rebuild them inside every sample (r9 review finding; the r8 bench
    // built them once outside the timed body)
    val body = benchBody(spark, name)
    val b = timeSamples(spark, name, defaultWarmups = 2)(body())
    val line = ChildMarker + b.samples.map(fmt).mkString("[", ",", "]")
    val metaLine = ChildMetaMarker + s"""{"warmups":${b.warmups},""" +
      s""""gc_total_sec":${fmt(b.gcTotalSec)},""" +
      s""""gc_max_run_sec":${fmt(b.gcMaxRunSec)}}"""
    println(line); println(metaLine)
    System.err.println(line); System.err.println(metaLine)
    Queries.releaseFixtures(spark)
    spark.stop()
  }

  /** Child mode for a BIN: time several benchmarks sequentially in this
    * one JVM ("name=runs" specs), emitting NAMED marker lines
    * (`GRAFT_BENCH_SAMPLES:<name>:[…]`) immediately after EACH entry —
    * a child killed mid-bin still yields its completed prefix. The
    * first entry pays the fresh JVM's codegen/JIT staging (warm floor
    * 2); later entries run in a warm JVM, so their floor drops to 1 and
    * the sub-second adaptive rule stops at 3 warmups instead of 5 —
    * the cold-JIT tax the 5-warmup rule existed for is already paid.
    */
  private def runMulti(specs: Seq[(String, Int, Int)]): Unit = {
    val spark = buildSession()
    specs.zipWithIndex.foreach { case ((name, runs, maxWarm), i) =>
      // settle the heap between entries: the r13 first packed run
      // showed prior-entry residue turning one timed run GC-bound
      // (repetition_documents 0.83 min / 2.17 med in a shared JVM vs
      // 0.43 solo) — an explicit full GC between entries charges the
      // cleanup to the gap, not to a sibling's timed run
      // two passes: the first unlinks, the second collects what the
      // first pass's finalization/reference processing freed — one
      // pass still left enough tenured garbage for mid-run GC storms
      // (w4: gc_max_run 4.6 s inside a timed run)
      if (i > 0) { System.gc(); Thread.sleep(150); System.gc();
        Thread.sleep(150) }
      val body = benchBody(spark, name)
      val b = timeSamples(spark, name,
        defaultWarmups = if (i == 0) 2 else 1,
        runsOverride = Some(runs),
        subSecondWarmFloor = if (i == 0) 5 else 3,
        maxWarmupsCap = maxWarm)(body())
      val line = ChildMarker + name + ":" +
        b.samples.map(fmt).mkString("[", ",", "]")
      val metaLine = ChildMetaMarker + name + ":" +
        s"""{"warmups":${b.warmups},""" +
        s""""gc_total_sec":${fmt(b.gcTotalSec)},""" +
        s""""gc_max_run_sec":${fmt(b.gcMaxRunSec)}}"""
      println(line); println(metaLine)
      System.err.println(line); System.err.println(metaLine)
    }
    Queries.releaseFixtures(spark)
    spark.stop()
  }

  /** JVM flags the child needs: module opens (Spark on JDK 17+) and
    * memory sizing, from this JVM's own arguments.
    */
  private def childJvmFlags: Seq[String] = {
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).toSeq
      .filter(a => a.startsWith("--add-opens") ||
        a.startsWith("--add-exports") || a.startsWith("-Xm") ||
        a.startsWith("-XX:") || a.startsWith("-Dfile.encoding"))
    // children get a FIXED larger heap than the parent's default 8g:
    // a packed bin accumulates tenured fixture/cache garbage across a
    // dozen entries, and at 8g one w4 bin tipped into a GC storm that
    // stamped a 0.9 s entry 21.7 s (gc_max_run 4.6 s) — heap-mode
    // noise, not plan cost. One child runs at a time on a 128 GiB box,
    // so the headroom is free.
    val heap = sys.env.getOrElse("SPARK_GRAFT_CHILD_MEM", "16g")
    inherited.filterNot(_.startsWith("-Xmx")) :+ s"-Xmx$heap"
  }

  /** Parse a meta marker (identified by its full `prefix`, which for
    * bin children includes the benchmark name) back into the parts of a
    * BenchSample the samples marker doesn't carry (tiny fixed-shape
    * JSON — a regex field grab keeps the parent dependency-free).
    */
  private def parseMeta(out: String, prefix: String,
      samples: Seq[Double]): BenchSample = {
    val metaPart = out.linesIterator.find(_.contains(prefix))
      .map(l => l.substring(l.indexOf(prefix))).getOrElse("")
    def num(name: String): Option[Double] =
      (name + "\":\\s*(-?[0-9.]+)").r.findFirstMatchIn(metaPart)
        .flatMap(_.group(1).toDoubleOption)
    BenchSample(samples,
      warmups = num("warmups").map(_.toInt).getOrElse(0),
      gcTotalSec = num("gc_total_sec").getOrElse(0.0),
      gcMaxRunSec = num("gc_max_run_sec").getOrElse(0.0))
  }

  /** Spawn one child JVM over a BIN of benchmarks (`--multi n=r,...`)
    * and parse its named markers. None = the child produced NO marker
    * at all (crash before the first entry, broken classpath);
    * otherwise every bin entry maps to its sample (missing names →
    * empty samples = failure, but completed siblings survive a
    * mid-bin death).
    */
  private def forkBin(specs: Seq[(String, Int, Int)])
      : Option[Map[String, BenchSample]] = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val arg = specs.map { case (n, r, w) => s"$n=$r:$w" }.mkString(",")
    val cmd = (Seq(javaBin) ++ childJvmFlags ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench",
        "--multi", arg)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // drain on a SEPARATE daemon thread: draining on this thread would
    // make the timeout unreachable (a hung child never closes stdout,
    // so a blocking read never returns and waitFor is never reached —
    // the exact failure class forking exists to contain); draining
    // after waitFor would deadlock on a full pipe buffer under Spark's
    // log volume. The thread owns the only read.
    val buf = new java.io.ByteArrayOutputStream()
    val drain = new Thread(() => {
      try { proc.getInputStream.transferTo(buf); () }
      catch { case _: java.io.IOException => () }
    }, s"bench-drain-${specs.head._1}")
    drain.setDaemon(true)
    drain.start()
    // budget scales with bin size: heavies sit alone (20 min, the old
    // per-query budget); a packed bin gets 20 min + 2/entry
    val budgetMin = 20L + 2L * (specs.size - 1)
    val exited = proc.waitFor(budgetMin,
      java.util.concurrent.TimeUnit.MINUTES)
    if (!exited) proc.destroyForcibly()
    drain.join(10000)
    // ByteArrayOutputStream is internally synchronized; join covers the
    // normal-exit case, toByteArray snapshots safely if the drain is
    // somehow still alive after a force-kill
    val out = new String(buf.toByteArray, "UTF-8")
    val parsed = specs.flatMap { case (name, _, _) =>
      val prefix = ChildMarker + name + ":"
      out.linesIterator.find(_.contains(prefix))
        .map(l => l.substring(l.indexOf(prefix) + prefix.length).trim)
        .collect { case s if s.startsWith("[") && s.endsWith("]") =>
          val body = s.drop(1).dropRight(1).trim
          val samples = if (body.isEmpty) Seq.empty[Double]
            else body.split(',').toSeq.map(_.trim.toDouble)
          name -> parseMeta(out, ChildMetaMarker + name + ":", samples)
        }
    }.toMap
    if (parsed.isEmpty) {
      System.err.println(s"[bench] child for [${specs.map(_._1)
        .mkString(",")}] reported nothing " +
        s"(exit=${if (exited) proc.exitValue() else "timeout"})")
      None
    } else {
      specs.collect { case (n, _, _) if !parsed.contains(n) =>
        System.err.println(s"[bench] $n missing from its bin child " +
          s"(exit=${if (exited) proc.exitValue() else "timeout"})")
      }
      Some(parsed)
    }
  }

  /** Parent mode: one child JVM per PLAN BIN (heavy/unknown entries
    * alone, cheap entries packed — see [[binPlan]]), sequential
    * (children get the whole machine — parallel children would contend
    * for the same local[32] cores and re-import the noise isolation
    * removes). After EVERY child the cumulative report is rewritten to
    * BENCH_RESULT.json, so however the run ends there is a parseable
    * artifact covering everything finished so far.
    */
  private def runForked(): Unit = {
    val priors = priorSpreads
    val bins = binPlan(priors)
    val planned = benchNames.size
    // soft deadline: a COMPLETE final report over most entries beats a
    // gate timeout over all of them (r11/r12: two rounds of rc=124).
    // Checked between children, so the run always finishes the bin in
    // flight and always prints the final driver-contract line.
    // 3000 s (was 2400): the OUTER gate allows ~3600 s, and every bin
    // already persists an incremental BENCH_RESULT.json, so an outer
    // kill still leaves a parseable artifact — the tighter internal
    // deadline was cutting the heavy tail (r13: 23 entries; r14-w1: 11)
    // to protect a stdout line the incremental file mostly supersedes.
    // 600 s of margin still guarantees the final driver-contract line.
    val deadlineSec =
      envInt("SPARK_GRAFT_BENCH_DEADLINE_SEC", 3000, floor = 0)
    val t0 = System.nanoTime()
    def elapsedSec: Long = (System.nanoTime() - t0) / 1000000000L
    System.err.println(s"[bench] plan: $planned benchmarks in " +
      s"${bins.size} child JVMs (${bins.count(_.size == 1)} solo + " +
      s"${bins.count(_.size > 1)} packed; priors for ${priors.size})")
    val done = scala.collection.mutable.LinkedHashMap
      .empty[String, BenchSample]
    def ordered: Seq[(String, BenchSample)] =
      benchNames.flatMap(n => done.get(n).map(n -> _))
    var cut = false
    bins.zipWithIndex.foreach { case (bin, i) =>
      if (!cut && deadlineSec > 0 && elapsedSec >= deadlineSec &&
          done.nonEmpty) {
        cut = true
        System.err.println(s"[bench] soft deadline ${deadlineSec}s " +
          s"reached after $i children (${done.size}/$planned " +
          "benchmarks) — reporting the completed set; raise " +
          "SPARK_GRAFT_BENCH_DEADLINE_SEC for full coverage")
      }
      if (!cut) forkBin(bin) match {
        case None if i == 0 =>
          // a first child that cannot even report means forking itself
          // is broken in this environment — fall back to the
          // single-JVM marathon rather than reporting 100% failures
          System.err.println("[bench] first child failed; falling " +
            "back to in-process mode")
          runAll()
          return
        case got =>
          val m = got.getOrElse(Map.empty)
          bin.foreach { case (n, _, _) =>
            done(n) = m.getOrElse(n, BenchSample(Seq.empty, 0, 0.0, 0.0))
          }
          report(ordered, forked = true, planned, partial = true)
          System.err.println(s"[bench] bin ${i + 1}/${bins.size} done " +
            s"(${done.size}/$planned benchmarks): " +
            bin.map { case (n, _, _) =>
              s"$n=${fmt(median(m.get(n).map(_.samples)
                .getOrElse(Seq.empty)))}" }.mkString(" "))
      }
    }
    report(ordered, forked = true, planned,
      partial = cut || done.size < planned, emit = true)
  }

  /** Legacy single-JVM marathon (SPARK_GRAFT_BENCH_FORK=0 or fallback). */
  private def runAll(): Unit = {
    val spark = buildSession()
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(String, BenchSample)]
    benchNames.foreach { n =>
      val body = benchBody(spark, n) // bind once; see runSingle
      results += (n -> timeSamples(spark, n)(body()))
      report(results.toSeq, forked = false, benchNames.size,
        partial = true)
    }
    report(results.toSeq, forked = false, benchNames.size,
      partial = results.size < benchNames.size, emit = true)
    Queries.releaseFixtures(spark)
    spark.stop()
  }

  /** Parse "--multi name=runs:maxwarm,..." specs (":maxwarm" optional —
    * defaults to the adaptive ceiling of 8).
    */
  private def parseSpecs(arg: String): Seq[(String, Int, Int)] =
    arg.split(',').toSeq.filter(_.nonEmpty).map { s =>
      s.split('=') match {
        case Array(n, rw) =>
          val (r, w) = rw.split(':') match {
            case Array(r0, w0) => (r0, w0)
            case Array(r0) => (r0, "8")
            case _ => sys.error(s"bad spec '$s'")
          }
          (n, r.toIntOption.filter(_ >= 1).getOrElse(
            sys.error(s"bad runs in spec '$s'")),
            w.toIntOption.filter(_ >= 1).getOrElse(
              sys.error(s"bad maxwarm in spec '$s'")))
        case Array(n) => (n, 5, 8)
        case _ => sys.error(s"bad spec '$s'")
      }
    }

  def main(args: Array[String]): Unit = args match {
    case Array("--single", name) => runSingle(name)
    case Array("--multi", specs) => runMulti(parseSpecs(specs))
    case _ =>
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") == "0") runAll()
      else runForked()
  }
}
