package graft.tools

import graft.pipeline.{LanguageModel, Temporal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale dry-run of the temporal operators and the bigram LM:
  * expands sf0.1's events table (100k rows, 1.5k users) to 10M events
  * over 150k users — scale-out along the USER axis (more keys, same
  * bounded per-key history), which is how event data actually grows
  * and what the operators' one-exchange-on-keys design assumes.
  *
  *   1. SESSIONIZE @ 10M — wall, label invariance across partition
  *      counts (the RANGE-frame prefix sum must be a pure function of
  *      the data), session count.
  *   2. AS-OF JOIN @ 2M clicks vs 2M purchases — wall, every-left-row-
  *      kept check, and a plan audit: exactly one hash exchange family
  *      on user_id, no BroadcastNestedLoopJoin/CartesianProduct (the
  *      naive range formulation would produce one).
  *   3. RANGE JOIN (24h windows) @ 2M×2M — wall + pair count, plus a
  *      1%-of-users exact cross-check against the naive quadratic
  *      join (validating the bin-cover argument at scale shape).
  *   4. BIGRAM LM @ 500k docs — train wall (two corpus aggregations)
  *      and score wall (bigram join), the CCNet-shape budget numbers.
  *
  * Output goes to stdout AND TEMPORAL_DRYRUN.md (committed evidence).
  */
object TemporalScaleDryRun {

  private val out = new StringBuilder
  private def log(s: String): Unit = { println(s); out.append(s).append('\n') }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    log(f"  wall: ${(System.nanoTime() - t0) / 1e9}%.1f s  ($label)")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("temporal-scale-dryrun")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val reps = 100
    val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
    // materialize the expanded corpus to parquet and read it back so
    // every measured leg (and the plan audit) starts from a clean scan
    // — the expansion's own broadcast crossJoin must not pollute the
    // operator plans under audit
    val eventsPath = java.nio.file.Files
      .createTempDirectory("graft_temporal_dryrun").toString + "/events"
    base.crossJoin(
        spark.range(reps.toLong).toDF("rep").hint("broadcast"))
      .select(($"event_id" + $"rep" * 1000000000L).as("event_id"),
        ($"user_id" + $"rep" * 100000L).as("user_id"),
        $"ts", $"event_type", $"value")
      .write.mode("overwrite").parquet(eventsPath)
    val events = spark.read.parquet(eventsPath)
    val n = events.count()
    log(s"# Temporal/LM 100x scale dry-run ($n events, " +
      s"${reps}x sf0.1 along the user axis)")
    log("")

    // ---------------------------------------------------- sessionize
    log("## sessionize @ 10M events (gap 6h)")
    val gap = 21600000000L
    val s32 = timed("sessionize + fingerprint @ 64 shuffle partitions") {
      Temporal.sessionize(events, Seq("user_id"), "ts", gap)
        .agg(count(lit(1)), sum(col("session_seq")),
          max(col("session_seq")))
        .head()
    }
    val s7 = timed("sessionize + fingerprint @ repartition(7) input") {
      Temporal.sessionize(events.repartition(7), Seq("user_id"), "ts",
          gap)
        .agg(count(lit(1)), sum(col("session_seq")),
          max(col("session_seq")))
        .head()
    }
    log(s"  label fingerprint invariant across partitionings: ${s32 == s7}")
    val nSessions = timed("sessionStats count") {
      Temporal.sessionStats(events, Seq("user_id"), "ts", gap).count()
    }
    log(f"  sessions: $nSessions " +
      f"(${n.toDouble / math.max(nSessions, 1L)}%.2f events/session)")
    log("")

    // ---------------------------------------------------- as-of join
    log("## as-of join @ 2M clicks vs 2M purchases")
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"ts".as("c_ts"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"),
        $"value".as("p_value"))
    val asof = Temporal.asofJoin(clicks, purchases, Seq("user_id"),
      "c_ts", "p_ts")
    val plan = asof.queryExecution.executedPlan.toString
    val bnlj = plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("CartesianProduct")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan.replace("\n", " ")).length
    log(s"  plan: hash exchanges=$exchanges, BNLJ/cartesian=$bnlj")
    val (nClicks, nAsof, nMatched) = timed("as-of join (backward)") {
      val c = clicks.count()
      val r = asof.agg(count(lit(1)), count(col("p_id"))).head()
      (c, r.getLong(0), r.getLong(1))
    }
    log(s"  left rows kept: ${nAsof == nClicks} " +
      s"($nAsof of $nClicks; matched $nMatched)")
    log("")

    // --------------------------------------------------- range join
    log("## range join (24h attribution windows) @ 2M x 2M")
    val windows = purchases.select($"user_id", $"p_id",
      $"p_ts".as("w_start"),
      timestamp_micros(unix_micros($"p_ts".cast("timestamp")) +
        lit(86400000000L)).as("w_end"))
    val nPairs = timed("binned point-in-interval join") {
      Temporal.pointInIntervalJoin(clicks, windows, Seq("user_id"),
        "c_ts", "w_start", "w_end", binWidthMicros = 86400000000L)
        .count()
    }
    log(s"  pairs: $nPairs")
    val sample = $"user_id" % 100 === 0
    val nSampleBinned = Temporal.pointInIntervalJoin(
      clicks.filter(sample), windows.filter(sample), Seq("user_id"),
      "c_ts", "w_start", "w_end", binWidthMicros = 86400000000L).count()
    val nSampleNaive = timed("naive range join on 1% of users") {
      clicks.filter(sample).join(windows.filter(sample), Seq("user_id"))
        .filter($"c_ts" >= $"w_start" && $"c_ts" <= $"w_end").count()
    }
    log(s"  1%-user binned == naive: ${nSampleBinned == nSampleNaive} " +
      s"($nSampleBinned vs $nSampleNaive)")
    log("")

    // ----------------------------------------------------- bigram LM
    log("## bigram LM @ 500k docs (vocab 10k)")
    val docsBase = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val docs = docsBase.crossJoin(
        spark.range(100L).toDF("rep").hint("broadcast"))
      .select(($"doc_id" + $"rep" * 1000000L).as("doc_id"), $"text")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nDocs = docs.count()
    val model = timed(s"train on $nDocs docs") {
      val m = LanguageModel.train(docs, "doc_id", "text",
        vocabSize = 10000)
      m.bigrams.count() // materialize the aggregations
      m
    }
    val scored = timed(s"score $nDocs docs") {
      LanguageModel.score(docs, "doc_id", "text", model)
        .agg(count(lit(1)), avg(col("lm_score"))).head()
    }
    log(f"  scored rows: ${scored.getLong(0)}; mean score: " +
      f"${scored.getDouble(1)}%.6f")
    log("")

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("TEMPORAL_DRYRUN.md"), out.toString)
    spark.stop()
  }
}
