package graft.tools

import graft.pipeline.{CacheScope, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× index-vs-kernel crossover measurement (round-8 verdict item 7):
  * the r8 dry-run claimed the persisted-index win is IO-bound and
  * "appears at real scale" from a WARM 10× corpus — this tool tests the
  * claim at 100× (≈500k docs) with BOTH paths reading parquet from disk
  * like a real daily driver: the corpus is WRITTEN to parquet and
  * dropped from the block-manager cache, so the kernel path pays
  * scan + re-hash of the full text per batch while the index path pays
  * the index scan (bucket signatures + shingle sets). Alternating-order
  * rounds cancel cache drift; byte sizes of both read sets are reported
  * so the IO argument is quantified, not asserted. Caveat (honest):
  * files this JVM just wrote sit in the OS page cache — 'cold' here
  * means un-cached by SPARK; true cold-device IO would widen whatever
  * gap the byte ratio implies.
  *
  * Appends its findings to DEDUP_DRYRUN.md under a '## 100x crossover'
  * heading (stdout carries the same lines).
  */
object IndexCrossoverTiming {

  private val out = new StringBuilder
  private def log(s: String): Unit = { println(s); out.append(s).append('\n') }

  private def dirBytes(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .appName("index-crossover")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("crossover")
    val corpusPath = s"$tmp/corpus"
    val idxPath = s"$tmp/mh_index"

    // 100x corpus, written to parquet and NOT kept cached: rep 0 is the
    // original sf0.1 text, others perturb with a rep token (distinct,
    // no cross-rep near-dups at 0.8)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
    base.as[(Long, String)].flatMap { case (id, text) =>
      (0 until reps).map { rep =>
        (id + rep * 100000L, if (rep == 0) text else text + s" r$rep x$rep")
      }
    }.toDF("doc_id", "text").repartition(32)
      .write.mode("overwrite").parquet(corpusPath)

    val corpusDf = () => spark.read.parquet(corpusPath)
    val nDocs = corpusDf().count()
    log(s"## 100x crossover (generated $nDocs docs -> cold parquet, " +
      s"reps=$reps)")

    val t0 = System.nanoTime()
    Dedup.writeMinhashIndex(corpusDf(), "doc_id", "text", idxPath)
    CacheScope.releaseSession(spark)
    log(f"  writeMinhashIndex (offline, once per corpus): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val corpusBytes = dirBytes(java.nio.file.Paths.get(corpusPath))
    val bucketBytes = dirBytes(java.nio.file.Paths.get(s"$idxPath/buckets"))
    val shingleBytes = dirBytes(java.nio.file.Paths.get(s"$idxPath/shingles"))
    log(f"  bytes read per daily batch: kernel path = corpus text " +
      f"${corpusBytes / 1e6}%.0f MB (then re-hashed on CPU); index path " +
      f"= buckets ${bucketBytes / 1e6}%.0f MB + shingles " +
      f"${shingleBytes / 1e6}%.0f MB (no corpus re-hash)")

    // daily batch: 2 500 near-copies of base docs
    val batch = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    log(s"  batch docs=${batch.count()} (batch itself kept warm — its " +
      "cost is identical on both paths)")

    def t(l: String)(b: => Long): Double = {
      val s0 = System.nanoTime()
      val n = b
      val sec = (System.nanoTime() - s0) / 1e9
      log(f"  $l: $sec%.1f s  pairs=$n")
      CacheScope.releaseSession(spark)
      sec
    }
    val fi = scala.collection.mutable.ArrayBuffer.empty[Double]
    val kp = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (i <- 1 to 3) {
      // alternate order each round so neither path always runs warmer
      if (i % 2 == 1) {
        fi += t(s"round$i fromIndex")(Dedup.minhashPairsFromIndex(spark,
          idxPath, batch, "doc_id", "text", threshold = 0.8).count())
        kp += t(s"round$i kernelPath")(Dedup.minhashPairsIncremental(batch,
          corpusDf(), "doc_id", "text", threshold = 0.8).count())
      } else {
        kp += t(s"round$i kernelPath")(Dedup.minhashPairsIncremental(batch,
          corpusDf(), "doc_id", "text", threshold = 0.8).count())
        fi += t(s"round$i fromIndex")(Dedup.minhashPairsFromIndex(spark,
          idxPath, batch, "doc_id", "text", threshold = 0.8).count())
      }
    }
    val fiMed = fi.sorted.apply(fi.length / 2)
    val kpMed = kp.sorted.apply(kp.length / 2)
    log(f"  medians: fromIndex=$fiMed%.1f s, kernelPath=$kpMed%.1f s " +
      f"(kernel/index = ${kpMed / fiMed}%.2f)")
    log("  (page-cache caveat: the JVM wrote these files, so the OS " +
      "still caches them — the measured gap is scan+decode+re-hash CPU " +
      "vs index decode; true cold-device IO would scale the gap by the " +
      "byte ratio above)")

    val existing = java.nio.file.Paths.get("DEDUP_DRYRUN.md")
    val prev = if (java.nio.file.Files.exists(existing))
      java.nio.file.Files.readString(existing) else ""
    java.nio.file.Files.writeString(existing,
      prev + (if (prev.endsWith("\n\n")) "" else "\n") + out.toString)
    spark.stop()
  }
}
