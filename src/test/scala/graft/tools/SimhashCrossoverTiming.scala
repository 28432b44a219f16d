package graft.tools

import graft.pipeline.{CacheScope, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× crossover for the SIMHASH index family (the minhash version is
  * [[IndexCrossoverTiming]]): same generated 100× corpus on cold
  * parquet, same alternating-order protocol, but the byte asymmetry is
  * the interesting part here — the simhash index's candidate side is a
  * 16-byte-per-doc fingerprint table, so the index path replaces the
  * full corpus-text scan + per-doc simhash64 kernel with a scan ~1/10
  * the bytes and no hashing; both paths still read shingle sets for the
  * verify join (persisted vs recomputed). At 500k docs the index write
  * DERIVES blocks=4 (blocks=8 saturates — the envelope working as
  * designed); the kernel path is pinned to the same stored point so the
  * outputs are identical and the timing isolates the scan/re-hash term.
  * Appends findings to DEDUP_DRYRUN.md.
  */
object SimhashCrossoverTiming {

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
      .appName("simhash-crossover")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("sh_crossover")
    val corpusPath = s"$tmp/corpus"
    val idxPath = s"$tmp/sh_index"

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
    log(s"## 100x crossover — simhash family ($nDocs docs, cold parquet, " +
      s"reps=$reps)")

    val t0 = System.nanoTime()
    Dedup.writeSimhashIndex(corpusDf(), "doc_id", "text", idxPath)
    CacheScope.releaseSession(spark)
    log(f"  writeSimhashIndex (offline, once per corpus): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val params = spark.read.json(s"$idxPath/params").head()
    val storedBlocks = params.getAs[Long]("blocks").toInt
    log(s"  derived operating point at this corpus: blocks=$storedBlocks" +
      (if (storedBlocks < 8)
        s" (blocks=8 saturates its ${64 / 8}-bit keys at $nDocs docs — " +
          "the envelope guard selected the wider key)"
      else s" (blocks=8 holds at $nDocs docs)"))

    val corpusBytes = dirBytes(java.nio.file.Paths.get(corpusPath))
    val fpBytes = dirBytes(java.nio.file.Paths.get(s"$idxPath/fingerprints"))
    val shingleBytes = dirBytes(java.nio.file.Paths.get(s"$idxPath/shingles"))
    log(f"  bytes per daily batch, candidate side: kernel path = corpus " +
      f"text ${corpusBytes / 1e6}%.0f MB (scan + simhash64 per doc); " +
      f"index path = fingerprints ${fpBytes / 1e6}%.0f MB (no hashing). " +
      f"Verify side both ways: shingles ${shingleBytes / 1e6}%.0f MB " +
      "(persisted vs recomputed from text)")

    val batch = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq xx")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    log(s"  batch docs=${batch.count()} (kept warm — identical cost on " +
      "both paths)")

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
    def fromIndex(): Long = Dedup.simhashPairsFromIndex(spark, idxPath,
      batch, "doc_id", "text", threshold = 0.8).count()
    def kernelPath(): Long = Dedup.simhashPairsIncremental(batch,
      corpusDf(), "doc_id", "text", threshold = 0.8,
      blocks = storedBlocks).count()
    for (i <- 1 to 3) {
      if (i % 2 == 1) {
        fi += t(s"round$i fromIndex")(fromIndex())
        kp += t(s"round$i kernelPath")(kernelPath())
      } else {
        kp += t(s"round$i kernelPath")(kernelPath())
        fi += t(s"round$i fromIndex")(fromIndex())
      }
    }
    val fiMed = fi.sorted.apply(fi.length / 2)
    val kpMed = kp.sorted.apply(kp.length / 2)
    log(f"  medians: fromIndex=$fiMed%.1f s, kernelPath=$kpMed%.1f s " +
      f"(kernel/index = ${kpMed / fiMed}%.2f)")
    log("  (same page-cache caveat as the minhash run: the gap is CPU + " +
      "decode, true cold-device IO would scale it by the byte ratio)")

    val existing = java.nio.file.Paths.get("DEDUP_DRYRUN.md")
    val prev = if (java.nio.file.Files.exists(existing))
      java.nio.file.Files.readString(existing) else ""
    java.nio.file.Files.writeString(existing,
      prev + (if (prev.endsWith("\n\n")) "" else "\n") + out.toString)
    spark.stop()
  }
}
