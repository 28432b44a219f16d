package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** MinHash/LSH near-duplicate detection: banded signature buckets over
  * word shingles, exact-Jaccard verification, incremental probes, and
  * the persisted signature index.
  */
private[pipeline] trait MinhashDedupOps extends Serializable { this: Dedup.type =>

  /** Roll a minhash index forward: sign `docs` at the index's STORED
    * params and append the bucket/shingle rows. Caller passes only ids
    * the index does not hold (a refresh delta's kept docs) — ids are
    * the row identity and this writer does not rescan to dedupe them.
    */
  def appendToMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, idCol: String,
      textCol: String): Unit = {
    val p = spark.read.json(s"$path/params").head()
    minhashBuckets(docs, idCol, textCol,
        p.getAs[Long]("numHashes").toInt, p.getAs[Long]("bands").toInt,
        p.getAs[Long]("shingleSize").toInt)
      .write.mode("append").parquet(s"$path/buckets")
    shingleSets(docs, idCol, textCol,
        p.getAs[Long]("shingleSize").toInt)
      .write.mode("append").parquet(s"$path/shingles")
  }

  /** Inverted shingle index (id, nsh, s) as a typed flatMap. */
  def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = shingleHashArray(if (text == null) "" else text, shingleSize)
        hs.map(h => (id, hs.length, h))
      }.toDF("id", "nsh", "s")
  }

  /** Per-doc (id, shingle-hash array) as a typed map (for pair verify). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, shingleHashArray(if (text == null) "" else text, shingleSize))
      }.toDF("id", "sh")
  }

  /** (id, band, bucket) LSH rows via a JVM minhash kernel. */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = numHashes / bands
    spread(df.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = shingleHashArray(if (text == null) "" else text, shingleSize)
        val sig = new Array[Long](numHashes)
        java.util.Arrays.fill(sig, Long.MaxValue)
        var si = 0
        while (si < hs.length) {
          val h = hs(si)
          var i = 0
          while (i < numHashes) {
            val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, i.toLong)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          si += 1
        }
        (0 until bands).map { b =>
          var acc = 1125899906842597L
          var r = 0
          while (r < rows) {
            acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
              sig(b * rows + r), acc)
            r += 1
          }
          (id, b, acc)
        }
      }.toDF("id", "band", "bucket")
  }

  /** LSH band buckets: split the signature into `bands` bands of
    * `rows = numHashes / bands` and hash each band. Emits one row per
    * (band, bucket) — candidates collide on at least one band.
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(col(idCol),
      minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (0 until rows).map(r => element_at(col("sig"),
            b * rows + r + 1)): _*)).as("bucket"))
    }
    withSig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Near-duplicate candidate pairs via banded MinHash (never all-pairs):
    * join within (band, bucket), then verify with exact n-gram Jaccard.
    * `maxBucketSize` drops degenerate buckets (skew guard).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val buckets = minhashBuckets(df, idCol, textCol, numHashes, bands,
      shingleSize)
    // skew guard via broadcast anti-join: the oversized-bucket list is
    // tiny (map-side partial agg shrinks it), so the bucket rows are
    // never shuffled for the cap — unlike a count-over-window, which
    // exchanges EVERY row on the bucket key before filtering
    val oversized = buckets.groupBy("band", "bucket").count()
      .filter(col("count") > maxBucketSize).select("band", "bucket")
    val bounded = sc.persist(buckets // used by both join sides
      .join(broadcast(oversized), Seq("band", "bucket"), "left_anti"))
    val l = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // joined on both pair sides — persist so the shingle kernel runs once
    val texts = sc.persist(shingleSets(df, idCol, textCol, shingleSize))
    verifyPairs(cand, texts, threshold)
  }

  /** Incremental near-dup detection: pairs of a NEW batch against an
    * EXISTING corpus plus batch-internal pairs — corpus-internal pairs
    * are excluded (they were found when the corpus was indexed). This is
    * the daily production shape: each incoming crawl batch joins the
    * banded MinHash buckets of batch ∪ corpus, but only bucket rows
    * containing a batch doc generate candidates, so the join cost scales
    * with |batch|, not |corpus|². Ids must be disjoint across the two
    * inputs; output orients batch ids as `id_a`.
    */
  def minhashPairsIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, batch.sparkSession)
    val bBuckets = minhashBuckets(batch, idCol, textCol, numHashes, bands,
      shingleSize)
    val cBuckets = minhashBuckets(corpus, idCol, textCol, numHashes, bands,
      shingleSize)
    val texts = shingleSets(
      batch.select(col(idCol), col(textCol))
        .union(corpus.select(col(idCol), col(textCol))),
      idCol, textCol, shingleSize)
    incrementalBucketPairs(bBuckets, cBuckets, texts, threshold,
      maxBucketSize, sc)
  }

  /** Shared incremental candidate+verify core: batch bucket rows against
    * corpus bucket rows (however the corpus side was produced — a fresh
    * kernel pass or a persisted index scan), then exact-Jaccard verify
    * against `texts` (the UNION of batch and corpus shingle sets).
    */
  private[pipeline] def incrementalBucketPairs(bBuckets: DataFrame,
      cBuckets: DataFrame, texts: DataFrame, threshold: Double,
      maxBucketSize: Int, sc: CacheScope): DataFrame = {
    val all0 = sc.persist(bBuckets.withColumn("new", lit(true))
      .union(cBuckets.withColumn("new", lit(false))))
    val oversized = all0.groupBy("band", "bucket").count()
      .filter(col("count") > maxBucketSize).select("band", "bucket")
    val all = all0
      .join(broadcast(oversized), Seq("band", "bucket"), "left_anti")
    val l = all.filter(col("new"))
      .select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = all.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("new").as("new_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      // batch-internal pairs once (a < b); batch-vs-corpus always
      .filter((col("new_b") && col("id_a") < col("id_b")) ||
        (!col("new_b") && col("id_a") =!= col("id_b")))
      .select("id_a", "id_b").distinct()
    verifyPairs(cand, sc.persist(texts), threshold)
  }

  /** Persist a MinHash LSH text index: the corpus's banded bucket rows
    * and shingle sets written as parquet, plus a params sidecar. This is
    * the daily-production layout [[minhashPairsFromIndex]] queries: the
    * corpus (the expensive side — one shingle+signature kernel pass over
    * everything) is indexed ONCE; each incoming batch then pays only its
    * own kernel pass plus bucket joins against the index scan. At 100 TB
    * the alternative — re-deriving corpus buckets per batch, what
    * [[minhashPairsIncremental]] does — re-reads and re-hashes the whole
    * corpus every day.
    */
  def writeMinhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    minhashBuckets(corpus, idCol, textCol, numHashes, bands, shingleSize)
      .write.mode("overwrite").parquet(s"$path/buckets")
    shingleSets(corpus, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$path/shingles")
    Seq((numHashes, bands, shingleSize))
      .toDF("numHashes", "bands", "shingleSize").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental near-dup pairs of a NEW batch against a PERSISTED
    * corpus index ([[writeMinhashIndex]]) — identical output contract to
    * [[minhashPairsIncremental]] (batch id first, batch-internal pairs
    * once, corpus-internal excluded; ids disjoint), but the corpus side
    * is an index SCAN, so per-batch cost is the batch kernel pass plus
    * joins — nothing corpus-sized is recomputed. Signature params come
    * from the index's sidecar (they are part of the index identity: a
    * batch hashed with different params would never collide correctly).
    */
  def minhashPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame =
    minhashPairsFromLoaded(loadMinhashIndex(spark, path), batch,
      idCol, textCol, threshold, maxBucketSize, scope)

  /** The fixed per-index state [[minhashPairsFromIndex]] re-derives on
    * every call: params sidecar plus the tombstone-reduced corpus
    * bucket/shingle frames. A continuously probing stream loads this
    * ONCE at stream construction (the [[graft.streaming.StreamOps]]
    * kmeans-model discipline) instead of paying the params read + index
    * frame setup per micro-batch; the index is fixed for the handle's
    * lifetime — fold the index, reload the handle.
    */
  final case class LoadedMinhashIndex(numHashes: Int, bands: Int,
    shingleSize: Int, cBuckets: DataFrame, cShingles: DataFrame)

  def loadMinhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): LoadedMinhashIndex = {
    val p = spark.read.json(s"$path/params").head()
    LoadedMinhashIndex(
      p.getAs[Long]("numHashes").toInt, p.getAs[Long]("bands").toInt,
      p.getAs[Long]("shingleSize").toInt,
      dropTombstoned(spark, path,
        spark.read.parquet(s"$path/buckets"), "id"),
      dropTombstoned(spark, path,
        spark.read.parquet(s"$path/shingles"), "id"))
  }

  /** [[minhashPairsFromIndex]] against a pre-loaded handle — identical
    * output, no per-call index reads.
    */
  def minhashPairsFromLoaded(ix: LoadedMinhashIndex, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, batch.sparkSession)
    val bBuckets = minhashBuckets(batch, idCol, textCol, ix.numHashes,
      ix.bands, ix.shingleSize)
    val texts = shingleSets(batch.select(col(idCol), col(textCol)),
        idCol, textCol, ix.shingleSize)
      .union(ix.cShingles)
    incrementalBucketPairs(bBuckets, ix.cBuckets, texts, threshold,
      maxBucketSize, sc)
  }
}
