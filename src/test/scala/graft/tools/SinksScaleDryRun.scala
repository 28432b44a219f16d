package graft.tools

import graft.pipeline.Dedup
import graft.sinks.{Bucketing, Compaction}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale dry-run for the round-11 lake-operations additions:
  *
  *   1. COMPACTION — fragment a 1.5M-row table into 2 000 small files
  *      (the streaming-sink pathology) and compact to a 32 MB target;
  *      record walls, file counts, and the row-count guard holding.
  *   2. BUCKETED JOIN — 1.5M-row orders × 1.5M-row customers written
  *      as 32-bucket tables; the co-located join must plan with ZERO
  *      exchanges (broadcast disabled so nothing hides the layout) and
  *      is timed against the same join over plain parquet reads.
  *   3. CONTAINMENT @ 500k docs — the inverted-index join with the
  *      stop-shingle guard at its scale default; wall + pair count
  *      (the corpus is the template-dense 100× expansion, the shape
  *      the guard exists for).
  *
  * Output goes to stdout AND SINKS_DRYRUN.md (committed evidence).
  */
object SinksScaleDryRun {

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
      .appName("sinks-scale-dryrun")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft_sinks_dryrun").toString
    log("# Sinks/containment scale dry-run (100x sf0.1)")
    log("")

    // --------------------------------------------------- compaction
    log("## compaction: 1.5M rows fragmented into 2000 files -> 32MB target")
    val orders0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val orders = orders0.crossJoin(
        spark.range(100L).toDF("rep").hint("broadcast"))
      .select(($"o_orderkey" + $"rep" * 10000000L).as("o_orderkey"),
        ($"o_custkey" + $"rep" * 100000L).as("o_custkey"),
        $"o_totalprice")
    val fragDir = s"$base/orders_frag"
    timed("fragment write (2000 files)") {
      orders.repartition(2000).write.parquet(fragDir)
    }
    val before = Compaction.plan(spark, fragDir, 32L * 1024 * 1024)
    log(s"  before: ${before.nFiles} files, ${before.totalBytes / 1048576} MB" +
      s", target ${before.targetFiles}")
    val nRows = spark.read.parquet(fragDir).count()
    timed("compact") {
      Compaction.compact(spark, fragDir, 32L * 1024 * 1024)
    }
    val after = Compaction.plan(spark, fragDir, 32L * 1024 * 1024)
    log(s"  after: ${after.nFiles} files; rows preserved: " +
      s"${spark.read.parquet(fragDir).count() == nRows}")
    log("")

    // ------------------------------------------------ bucketed join
    log("## bucketed co-located join: 1.5M x 1.5M, 32 buckets")
    val custs = spark.read
      .parquet("/root/testdata/sf0.1/customer.parquet")
      .crossJoin(spark.range(100L).toDF("rep").hint("broadcast"))
      .select(($"c_custkey" + $"rep" * 100000L).as("o_custkey"),
        $"c_mktsegment")
    timed("bucketed writes (the one-time layout shuffle)") {
      Bucketing.writeBucketed(orders, "dr_bkt_orders",
        s"$base/bkt_orders", Seq("o_custkey"), 32)
      Bucketing.writeBucketed(custs, "dr_bkt_custs",
        s"$base/bkt_custs", Seq("o_custkey"), 32)
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bucketed = Bucketing.bucketedJoin(spark, "dr_bkt_orders",
        "dr_bkt_custs", Seq("o_custkey"))
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    val plan = bucketed.queryExecution.executedPlan.toString
    val joinExchanges = "Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(plan.replace("\n", " ")).length
    log(s"  join-side exchanges in bucketed plan: $joinExchanges " +
      s"(sort-merge: ${plan.contains("SortMergeJoin")})")
    val nB = timed("bucketed join + agg") { bucketed.count() }
    val plainJ = spark.read.parquet(s"$base/bkt_orders")
      .join(spark.read.parquet(s"$base/bkt_custs"), "o_custkey")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    val nP = timed("same join over path reads (layout lost, shuffles)") {
      plainJ.count()
    }
    log(s"  result parity: ${nB == nP}")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    log("")

    // ------------------------------------------------- containment
    log("## containment @ 500k docs (guard=1000, threshold 0.9)")
    // the PipelineScaleDryRun template corpus (rep-seeded half-token
    // reps, C ~0.5 between family members — below threshold) plus
    // PLANTED excerpts: every 50th base doc gains a half-truncation
    // (+50M id) that is fully contained in its source
    val docs0 = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")
    val reps = docs0.crossJoin(
        spark.range(100L).toDF("rep").hint("broadcast"))
      .select(($"doc_id" + $"rep" * 1000000L).as("doc_id"),
        when($"rep" === 0, $"text")
          .otherwise(concat_ws(" ",
            filter(split($"text", " "),
              (w, i) => pmod(hash(w, $"rep", lit(0)), lit(2)) === (i % 2)),
            concat(lit("rep"), $"rep"),
            concat(lit("uid"), $"doc_id", lit("x"), $"rep")))
          .as("text"))
    val excerpts = docs0.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 50000000L).as("doc_id"),
        array_join(slice(split($"text", " "), lit(1),
          greatest(lit(2), (size(split($"text", " ")) / 2).cast("int"))),
          " ").as("text"))
    val docsPath = s"$base/docs"
    reps.unionByName(excerpts).write.parquet(docsPath)
    val corpus = spark.read.parquet(docsPath)
    val nPlanted = excerpts.count()
    spark.catalog.clearCache()
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.9, maxDocFreq = 1000)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nPairs = timed("containmentPairs (inverted index, guarded)") {
      pairs.count()
    }
    val found = pairs.filter($"id_b" >= 50000000L &&
      $"id_a" === $"id_b" - 50000000L).count()
    log(s"  pairs at containment >= 0.9: $nPairs; planted excerpts " +
      s"recovered: $found of $nPlanted")

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SINKS_DRYRUN.md"), out.toString)
    spark.stop()
  }
}
