package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for 100 TB training-data pipelines.
  *
  * Scale design: every variant is bucketed — content-hash `groupBy` for
  * exact dups, banded MinHash buckets for near-dups, SimHash prefix buckets,
  * length-bucketed blocking for n-gram Jaccard — so no operator ever
  * materializes the full cross product. Shuffles are on hash keys with
  * near-uniform distribution; skew on popular buckets is bounded by
  * `maxBucketSize` guards.
  */
object Dedup {

  // -------------------------------------------------------------------
  // exact dedup
  // -------------------------------------------------------------------

  /** Exact duplicate groups by content hash: one row per duplicated
    * content with the keeper (min id) and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Incremental exact-duplicate pairs — the content-hash member of the
    * incremental family: batch docs whose content equals a corpus doc
    * (batch id first) or another batch doc (once, `a < b`);
    * corpus-internal duplicates excluded. One hash join on md5, batch on
    * the small side.
    */
  def exactPairsIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val l = batch.select(col(idCol).cast("long").as("id_a"),
      md5(col(textCol)).as("h"))
    val r = corpus.select(col(idCol).cast("long").as("id_b"),
        md5(col(textCol)).as("h")).withColumn("new_b", lit(false))
      .union(batch.select(col(idCol).cast("long").as("id_b"),
        md5(col(textCol)).as("h")).withColumn("new_b", lit(true)))
    l.join(r, "h")
      // batch-internal pairs once (a < b); batch-vs-corpus always
      .filter((col("new_b") && col("id_a") < col("id_b")) ||
        (!col("new_b") && col("id_a") =!= col("id_b")))
      .select("id_a", "id_b")
  }

  /** Keep one row per distinct content (the min-id row). */
  def dropExactDuplicates(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Persisted EXACT-dedup index: one row per distinct corpus content
    * (`h` = md5, its min-id keeper, copy count), parquet-partitioned by
    * the 2-hex hash prefix `hp` (256 directories) so a batch probe
    * reads only the prefixes its hashes fall in, plus a BLOOM-FILTER
    * sidecar over `xxhash64(h)` — the per-batch probe tests the bloom
    * FIRST (a pure codegen'd `BloomFilterMightContain` expression, no
    * UDF), so the clean-batch common case of a daily driver touches no
    * index partition at all; false positives are resolved by the real
    * join, and blooms have no false negatives, so the contract is
    * exact.
    *
    * Sizing note for 100 TB: the sidecar bloom is one driver-held blob
    * (~1.2 MB per 10⁶ distinct contents at fpp 0.01); at extreme corpus
    * cardinality raise `fpp` or drop the bloom (`fpp = 1` writes a
    * degenerate always-positive bloom and the probe degrades gracefully
    * to prefix-pruned index joins).
    */
  def writeExactIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, fpp: Double = 0.01): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(fpp > 0 && fpp <= 1, s"fpp $fpp outside (0,1]")
    corpus.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("h"))
      .groupBy("h")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_copies"))
      .withColumn("hp", substring(col("h"), 1, 2))
      .write.mode("overwrite").partitionBy("hp").parquet(s"$path/hashes")
    val idx = spark.read.parquet(s"$path/hashes")
    val n = math.max(1L, idx.count())
    // fpp = 1 is the documented opt-out: size the bit array for ONE item
    // and insert all n, saturating it to always-positive — a bytes-sized
    // blob whose probe prunes nothing (no false negatives possible)
    val bloom = idx.select(xxhash64(col("h")).as("hx"))
      .stat.bloomFilter("hx", if (fpp >= 1) 1L else n,
        if (fpp >= 1) 0.5 else fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Seq(Tuple1(bos.toByteArray)).toDF("bloom").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/bloom")
    Seq((n, fpp)).toDF("distinctContents", "fpp").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

  /** Per-batch exact-dedup decisions against a persisted
    * [[writeExactIndex]]: one row per batch document —
    * `(id, status, keep_id)` with status `dup_of_corpus` (keeper = the
    * index keeper), `dup_in_batch` (content new to the corpus but
    * repeated in the batch; keeper = min batch id), or `new` (keeper =
    * itself). Deterministic and windowless, so the DuckDB oracle
    * replays it exactly.
    *
    * Scale path: bloom prefilter (map-only) → index join restricted to
    * the surviving hash prefixes (true partition pruning via an `isin`
    * on the partition column; the prefix list is ≤256 strings collected
    * driver-side — small by construction) → batch-internal min-per-hash
    * aggregate. A batch with no bloom hits never opens an index file.
    */
  def exactKeepFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim
    val bloomBytes = spark.read.parquet(s"$path/bloom")
      .head().getAs[Array[Byte]]("bloom")
    val bh = batch.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("h"))
    val mightContain = graftshim.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        graftshim.resolvedExpression(lit(bloomBytes)),
        graftshim.resolvedExpression(xxhash64(col("h")))))
    val positive = bh.filter(mightContain)
    val prefixes = positive.select(substring(col("h"), 1, 2).as("hp"))
      .distinct().collect().map(_.getString(0)).toSeq
    val idxMatches =
      if (prefixes.isEmpty)
        spark.emptyDataFrame
          .select(lit("").as("h"), lit(0L).as("keep_id")).limit(0)
      else
        dropTombstoned(spark, path,
            spark.read.parquet(s"$path/hashes")
              .filter(col("hp").isin(prefixes: _*)), "h")
          .join(positive.select(col("h")).distinct(), "h")
          .select(col("h"), col("keep_id"))
    val bmin = bh.groupBy("h").agg(min("id").as("bkeep"))
    bh.join(idxMatches.withColumnRenamed("keep_id", "ckeep"),
        Seq("h"), "left")
      .join(bmin, "h")
      .select(col("id").as(idCol),
        when(col("ckeep").isNotNull, lit("dup_of_corpus"))
          .when(col("id") =!= col("bkeep"), lit("dup_in_batch"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("ckeep"), col("bkeep")).as("keep_id"))
  }

  // -------------------------------------------------------------------
  // index tombstones — delete-by-content without rebuild
  // -------------------------------------------------------------------

  /** Deletion CLOSURE of a removal request: every corpus row sharing
    * content with any seed id, as `(id, h)` rows. Compliance deletions
    * are content-level — removing one copy of a duplicated text while
    * its clones survive deletes nothing — so this is the blessed
    * constructor for [[writeTombstones]]: a content-closed set is
    * exactly the condition under which tombstoned index reads equal a
    * rebuild on the reduced corpus for ALL index families (the exact
    * index is keyed by content hash; a partial deletion of one hash's
    * copies cannot be represented there).
    *
    * Scale: the seed set is request-sized → both joins broadcast; the
    * corpus is scanned once, map-side.
    */
  def contentTombstones(corpus: DataFrame, idCol: String, textCol: String,
      seedIds: DataFrame): DataFrame = {
    val ch = corpus.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("h"))
    val seeds = seedIds.select(
      col(seedIds.columns.head).cast("long").as("id"))
    val seedH = ch.join(broadcast(seeds), "id").select("h").distinct()
    ch.join(broadcast(seedH), "h").select("id", "h")
  }

  /** Append `(id, h)` deletion rows to an index's tombstone sidecar.
    * Every `*FromIndex` reader of this path then excludes the deleted
    * rows (ids for the per-doc families, content hashes for the exact
    * index) — the daily deletion batch costs one small parquet append
    * instead of an index rebuild. Requests accumulate across calls
    * (append mode); a rebuild clears them (`overwrite` of the index
    * root). The exact index's bloom sidecar is NOT rewritten: it may
    * stay positive for deleted content, which only costs a pruned-join
    * probe that then finds no live row — false positives were already
    * in its contract, and it can never go falsely negative.
    *
    * Pass a content-closed set (see [[contentTombstones]]) for exact
    * rebuild parity; `deleted` must carry the doc text (deletion
    * requests do — the hash is computed here so callers never manage
    * raw digests).
    */
  def writeTombstones(deleted: DataFrame, idCol: String, textCol: String,
      path: String): Unit =
    deleted.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("h"))
      .write.mode("append").parquet(s"$path/tombstones")

  /** Roll the exact index FORWARD: append contents the index does not
    * yet hold (anti-join on the stored hashes — an index-sized read,
    * never a corpus rescan) and rebuild the bloom sidecar from the
    * updated hash set. The bloom rebuild is NOT optional: an appended
    * content missing from the bloom would prefilter to "absent" and
    * resurface as `new` — a false NEGATIVE, the one failure mode the
    * bloom contract forbids (stale-positive after tombstones is safe;
    * stale-negative after appends is not).
    *
    * Pass one row per content (e.g. a refresh delta's `kept` docs);
    * duplicate contents within `docs` collapse to their min id here.
    * Appends accumulate small files per hash prefix — compact with
    * [[graft.sinks.Compaction]] on the index's maintenance cadence.
    */
  def appendToExactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, idCol: String,
      textCol: String): Unit = {
    import spark.implicits._
    val existing = spark.read.parquet(s"$path/hashes").select("h")
    docs.select(col(idCol).cast("long").as("id"),
        md5(col(textCol)).as("h"))
      .groupBy("h")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_copies"))
      .join(existing, Seq("h"), "left_anti")
      .withColumn("hp", substring(col("h"), 1, 2))
      .write.mode("append").partitionBy("hp").parquet(s"$path/hashes")
    val idx = spark.read.parquet(s"$path/hashes")
    val fpp = spark.read.json(s"$path/params").head().getAs[Double]("fpp")
    val n = math.max(1L, idx.count())
    val bloom = idx.select(xxhash64(col("h")).as("hx"))
      .stat.bloomFilter("hx", if (fpp >= 1) 1L else n,
        if (fpp >= 1) 0.5 else fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Seq(Tuple1(bos.toByteArray)).toDF("bloom").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/bloom")
    Seq((n, fpp)).toDF("distinctContents", "fpp").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

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

  /** Roll an ngram index forward — same contract as
    * [[appendToMinhashIndex]] for the inverted-shingle family.
    */
  def appendToNgramIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, docs: DataFrame, idCol: String,
      textCol: String): Unit = {
    val shingleSize = spark.read.json(s"$path/params").head()
      .getAs[Long]("shingleSize").toInt
    shingleIndex(docs, idCol, textCol, shingleSize)
      .write.mode("append").parquet(s"$path/shingle_index")
  }

  private def tombstonedKeys(spark: org.apache.spark.sql.SparkSession,
      path: String, key: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      Some(spark.read.parquet(p.toString).select(key).distinct())
    else None
  }

  /** Id-only tombstones for indexes whose rows have no text identity
    * (media fingerprints, embeddings): the content-hash slot is filled
    * from the rendered id — only the exact index reads it, and an exact
    * index is never keyed by bare ids.
    */
  def writeIdTombstones(ids: DataFrame, idCol: String,
      path: String): Unit =
    writeTombstones(ids.withColumn("_t", col(idCol).cast("string")),
      idCol, "_t", path)

  /** Corpus-side index frame minus tombstoned rows: anti-join on `key`,
    * explicitly broadcast (deletion lists are request-sized, never
    * corpus-sized). No tombstone sidecar = identity — clean indexes pay
    * nothing.
    */
  private[pipeline] def dropTombstoned(
      spark: org.apache.spark.sql.SparkSession,
      path: String, frame: DataFrame, key: String): DataFrame =
    tombstonedKeys(spark, path, key) match {
      case Some(t) => frame.join(broadcast(t), Seq(key), "left_anti")
      case None => frame
    }

  // -------------------------------------------------------------------
  // shingles + MinHash/LSH
  // -------------------------------------------------------------------

  /** Distinct word `n`-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val count = size(words)
    when(count < n, array(concat_ws(" ", words)))
      .otherwise(array_distinct(transform(sequence(lit(0), count - n),
        i => concat_ws(" ", (0 until n).map(k =>
          element_at(words, (i + k + 1).cast("int"))): _*))))
  }

  /** Shingles pre-hashed to 64-bit ints: set operations (intersect/union,
    * minhash) run on longs instead of strings — an order of magnitude
    * cheaper at the candidate-join stage, identical results w.h.p.
    * (collision odds ≈ n²/2⁶⁵).
    */
  def shingleHashes(text: Column, n: Int = 3): Column = {
    // hash the word n-tuple directly (multi-arg xxhash64) — no shingle
    // string allocation; same distinct set as hashing "w1 w2 w3"
    val words = split(lower(trim(text)), "\\s+")
    val count = size(words)
    when(count < n, array(xxhash64(concat_ws(" ", words))))
      .otherwise(array_distinct(transform(sequence(lit(0), count - n),
        i => xxhash64((0 until n).map(k =>
          element_at(words, (i + k + 1).cast("int"))): _*))))
  }

  /** MinHash signature: array of `numHashes` minima over the shingle set
    * (shingle→minhash→band→bucket pipeline). ONE aggregate pass over the
    * pre-hashed shingles — the shingle subtree is built once per row, not
    * once per hash function. Hash family = seeded xxhash64 over the base
    * hash (no modular arithmetic → safe under ANSI overflow checks).
    */
  def minhashSignature(text: Column, numHashes: Int = 64,
      shingleSize: Int = 3): Column =
    aggregate(shingleHashes(text, shingleSize),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h) => zip_with(acc,
        array((0 until numHashes).map(i => xxhash64(lit(i), h)): _*),
        (a, b) => least(a, b)))

  // -------------------------------------------------------------------
  // JVM-side shingle kernels. Catalyst higher-order functions (transform/
  // aggregate lambdas) are NOT whole-stage-codegen'd — they interpret per
  // element, ~10× slower on the shingle hot path. These typed flatMaps are
  // the deliberate mapPartitions-tier escape hatch for that hot path; the
  // relational shape (explode → join → groupBy) stays declarative.
  // -------------------------------------------------------------------

  /** Spread few-split inputs to full parallelism before a per-row JVM
    * kernel: a local parquet file or single-partition stream otherwise
    * runs the kernel — and everything downstream until the first
    * exchange, including bucket-join collision production — on 1-4
    * cores. No-op when the input already has enough splits (the 100 TB
    * case: never shuffle a corpus for parallelism it already has).
    */
  private[pipeline] def spread(df: DataFrame): DataFrame = {
    val dp = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < dp) df.repartition(dp) else df
  }

  private[pipeline] def hashBytes(b: Array[Byte], seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(b,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)

  /** Distinct hashed word n-gram shingles of one text (JVM kernel),
    * SORTED ascending: every consumer is order-insensitive (inverted
    * index emission, minhash signature folds, intersection/union SIZES
    * in the Jaccard verify), and sorted arrays let the verify stage run
    * an allocation-free linear merge ([[graft.functions.ShingleOps]])
    * instead of a per-pair hash set — the verify join is the dominant
    * cost of every near-dup family once candidates are dense.
    */
  private[pipeline] def shingleHashArray(text: String, n: Int): Array[Long] = {
    val words = text.trim.toLowerCase.split("\\s+")
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (words.length < n) {
      set.add(hashBytes(words.mkString(" ").getBytes("UTF-8"), 42L))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) { if (k > 0) sb.append(' '); sb.append(words(i + k)); k += 1 }
        set.add(hashBytes(sb.toString.getBytes("UTF-8"), 42L))
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    out
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
  private def incrementalBucketPairs(bBuckets: DataFrame,
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
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, spark)
    val p = spark.read.json(s"$path/params").head()
    val (numHashes, bands, shingleSize) = (
      p.getAs[Long]("numHashes").toInt, p.getAs[Long]("bands").toInt,
      p.getAs[Long]("shingleSize").toInt)
    val bBuckets = minhashBuckets(batch, idCol, textCol, numHashes, bands,
      shingleSize)
    val cBuckets = dropTombstoned(spark, path,
      spark.read.parquet(s"$path/buckets"), "id")
    val texts = shingleSets(batch.select(col(idCol), col(textCol)),
        idCol, textCol, shingleSize)
      .union(dropTombstoned(spark, path,
        spark.read.parquet(s"$path/shingles"), "id"))
    incrementalBucketPairs(bBuckets, cBuckets, texts, threshold,
      maxBucketSize, sc)
  }

  /** Alias for [[ngramJaccardPairs]] from when the stop-shingle guard
    * was opt-IN; the guard now defaults ON in the bare operator (round-9
    * change), so this adds nothing — kept for source compatibility.
    */
  def ngramJaccardPairsAtScale(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      maxDocFreq: Int = 1000): DataFrame =
    ngramJaccardPairs(df, idCol, textCol, threshold, shingleSize, maxDocFreq)

  /** Shared verify stage for every candidate generator: enrich candidate
    * pairs with both shingle sets, apply the exact length block (J ≤
    * min/max of the set sizes — size-mismatched pairs cannot reach the
    * threshold, so they are pruned before paying for the intersection),
    * then exact Jaccard + threshold. `texts` must be the persisted
    * [[shingleSets]] frame (joined on both sides).
    */
  private def verifyPairs(cand: DataFrame, texts: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(texts.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .filter(size(col("sh_a")) >= lit(threshold) * size(col("sh_b")) &&
        size(col("sh_b")) >= lit(threshold) * size(col("sh_a")))
      // codegen'd linear merge over the sorted shingle arrays — NOT
      // array_intersect/array_union, which build two hash tables per
      // pair (the verify stage's former dominant cost)
      .withColumn("jaccard", graft.functions.ShingleOps.jaccardSortedC(
        col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** All near-dup pairs by exact n-gram Jaccard via an inverted shingle
    * index: explode (doc, shingle), self-join on the shingle hash, count
    * matches per pair = |A∩B|, then J = inter / (|A|+|B|−inter). Exact
    * (identical to an all-pairs oracle — every J>0 pair shares a shingle)
    * but the join work is Σ_s freq(s)², not n², and it is a single hash
    * shuffle on the shingle key.
    *
    * Scale guard: `maxDocFreq` drops shingles present in more docs than
    * the cap from candidate *generation* (stop-shingle skew guard) —
    * ON BY DEFAULT (1000): a shingle in f docs contributes f² join rows
    * on one key, and boilerplate shingles in a 100 TB corpus make that
    * unbounded, so the undecorated name must not be the unguarded
    * self-join. Recall caveat: a true pair sharing ONLY dropped shingles
    * is missed — at near-dup thresholds such pairs share many shingles,
    * so only boilerplate-only pairs are affected. Pass `maxDocFreq = 0`
    * to opt INTO exact mode (what the oracle queries and every truth
    * computation do explicitly).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      maxDocFreq: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val exploded = shingleIndex(df, idCol, textCol, shingleSize)
    // stop-shingle guard via broadcast anti-join (same shape as the
    // minhash/simhash caps): the oversized list is tiny after map-side
    // partial aggregation, so no per-row exchange + window sort — the
    // only full shuffle on `s` stays the candidate join itself
    val bounded =
      if (maxDocFreq > 0) {
        val oversized = exploded.groupBy("s").count()
          .filter(col("count") > maxDocFreq).select("s")
        exploded.join(broadcast(oversized), Seq("s"), "left_anti")
      } else exploded
    // both join sides read this subtree; persist so the shingle hashing
    // runs once (self-joins do not reuse exchanges across projections)
    val cached = sc.persist(bounded)
    val l = cached.select(col("s"), col("id").as("id_a"),
      col("nsh").as("n_a"))
    val r = cached.select(col("s"), col("id").as("id_b"),
      col("nsh").as("n_b"))
    l.join(r, "s").filter(col("id_a") < col("id_b"))
      // exact length block: J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|),
      // so size-mismatched pairs cannot reach the threshold — prune them
      // BEFORE the per-pair aggregation (codegen'd filter on the join
      // output, no correctness impact)
      .filter(col("n_a") >= lit(threshold) * col("n_b") &&
        col("n_b") >= lit(threshold) * col("n_a"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Asymmetric shingle CONTAINMENT — the partial-copy detector
    * Jaccard structurally misses: a paragraph quoted inside a much
    * longer document has tiny Jaccard (union is the long doc) but
    * containment `C(A,B) = |A∩B| / |A|` near 1. Emits one row per
    * unordered pair whose LARGER direction reaches `threshold`:
    * `(id_a, id_b, containment_a, containment_b)` with `id_a < id_b`,
    * where `containment_a` is how much of A lies inside B and vice
    * versa.
    *
    * Same inverted-index join as [[ngramJaccardPairs]] but WITHOUT the
    * length block — size-mismatched pairs are exactly the ones this
    * operator exists for — so the stop-shingle guard (`maxDocFreq`,
    * opt-out via 0 like the Jaccard family) is the only candidate
    * bound; keep it on at scale.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, shingleSize: Int = 3,
      maxDocFreq: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val exploded = shingleIndex(df, idCol, textCol, shingleSize)
    val bounded =
      if (maxDocFreq > 0) {
        val oversized = exploded.groupBy("s").count()
          .filter(col("count") > maxDocFreq).select("s")
        exploded.join(broadcast(oversized), Seq("s"), "left_anti")
      } else exploded
    val cached = sc.persist(bounded)
    val l = cached.select(col("s"), col("id").as("id_a"),
      col("nsh").as("n_a"))
    val r = cached.select(col("s"), col("id").as("id_b"),
      col("nsh").as("n_b"))
    l.join(r, "s").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment_a",
        col("inter").cast("double") / col("n_a"))
      .withColumn("containment_b",
        col("inter").cast("double") / col("n_b"))
      .filter(greatest(col("containment_a"), col("containment_b"))
        >= threshold)
      .select("id_a", "id_b", "containment_a", "containment_b")
  }

  /** Incremental EXACT n-gram Jaccard — the inverted-index member of the
    * incremental family, with the others' output contract (batch id
    * first, batch-internal once, corpus-internal excluded) but EXACT
    * semantics: identical to all-pairs Jaccard restricted to pairs with
    * a batch member (every J>0 pair shares a shingle, so the index join
    * finds it — no candidate bound, no cap unless `maxDocFreq` guards
    * stop-shingles). Join work is Σ_s freq_batch(s)·freq_all(s): scales
    * with the BATCH's shingle frequencies, not the corpus pair count.
    */
  def ngramJaccardPairsIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      shingleSize: Int = 3, maxDocFreq: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, batch.sparkSession)
    val all0 = shingleIndex(batch, idCol, textCol, shingleSize)
      .withColumn("new", lit(true))
      .union(shingleIndex(corpus, idCol, textCol, shingleSize)
        .withColumn("new", lit(false)))
    ngramIncrementalCore(all0, threshold, maxDocFreq, sc)
  }

  /** Persist an inverted n-gram shingle index (id, nsh, s) plus params —
    * the exact-Jaccard member of the persisted-index family.
    */
  def writeNgramIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleSize: Int = 3): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    shingleIndex(corpus, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$path/shingle_index")
    Seq(Tuple1(shingleSize)).toDF("shingleSize").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

  /** [[ngramJaccardPairsIncremental]] against a persisted
    * [[writeNgramIndex]] — corpus side is an index scan, per-batch cost
    * is the batch's shingle kernel plus the index join.
    */
  def ngramJaccardPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, maxDocFreq: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, spark)
    val shingleSize =
      spark.read.json(s"$path/params").head()
        .getAs[Long]("shingleSize").toInt
    val all0 = shingleIndex(batch, idCol, textCol, shingleSize)
      .withColumn("new", lit(true))
      .union(dropTombstoned(spark, path,
          spark.read.parquet(s"$path/shingle_index"), "id")
        .withColumn("new", lit(false)))
    ngramIncrementalCore(all0, threshold, maxDocFreq, sc)
  }

  /** Shared incremental exact-Jaccard core over (id, nsh, s, new)
    * inverted-index rows (kernel pass or index scan on the corpus side).
    * Same per-pair arithmetic as [[ngramJaccardPairs]].
    */
  private def ngramIncrementalCore(all0: DataFrame, threshold: Double,
      maxDocFreq: Int, sc: CacheScope): DataFrame = {
    val bounded =
      if (maxDocFreq > 0) {
        val oversized = all0.groupBy("s").count()
          .filter(col("count") > maxDocFreq).select("s")
        all0.join(broadcast(oversized), Seq("s"), "left_anti")
      } else all0
    val cached = sc.persist(bounded)
    val l = cached.filter(col("new")).select(col("s"),
      col("id").as("id_a"), col("nsh").as("n_a"))
    val r = cached.select(col("s"), col("id").as("id_b"),
      col("nsh").as("n_b"), col("new").as("new_b"))
    l.join(r, "s")
      // batch-internal pairs once (a < b); batch-vs-corpus always
      .filter((col("new_b") && col("id_a") < col("id_b")) ||
        (!col("new_b") && col("id_a") =!= col("id_b")))
      // exact length block (see ngramJaccardPairs)
      .filter(col("n_a") >= lit(threshold) * col("n_b") &&
        col("n_b") >= lit(threshold) * col("n_a"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per-bit vote of token hashes.
    * Computed with a single `aggregate` over a 64-int vote vector
    * (one pass, codegen-friendly).
    */
  def simhash(text: Column): Column = {
    val hashes = transform(split(lower(trim(text)), "\\s+"),
      t => xxhash64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(k =>
          when(shiftright(h, k).bitwiseAND(1) === 1, 1).otherwise(-1)): _*),
        (x, y) => x + y))
    (0 until 64).map(k =>
      when(element_at(votes, k + 1) > 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash per document via explode + hash aggregate: 64 per-bit vote
    * sums stay inside whole-stage codegen (the single-Column `simhash`
    * variant builds a 64-wide lambda per token, which falls out of codegen
    * and runs ~50× slower at scale).
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map(k =>
      sum(shiftright(col("h"), k).bitwiseAND(1)).as(s"b$k"))
    val agg = toks.groupBy("id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sh = (0 until 64).map(k =>
      when(col(s"b$k") * 2 > col("n"), lit(1L << k)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sh.as("sh"))
  }

  /** One-pass JVM SimHash kernel — bit-identical to [[simhashDf]] (same
    * xxhash64 token hashes, same strict-majority vote over ALL token
    * occurrences) but with no token explode, no 64-column aggregate and no
    * shuffle: one map over the rows. The declarative forms above stay as
    * the reference semantics; this is the hot-path variant (see the
    * shingle-kernel note at the top of this section).
    */
  private[pipeline] def simhash64(text: String): Long = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashBytes(toks(i).getBytes("UTF-8"), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var sh = 0L
    var k = 0
    while (k < 64) { if (votes(k) > 0) sh |= (1L << k); k += 1 }
    sh
  }

  /** (id, sh) via the JVM kernel. */
  def simhashDfJ(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    spread(df.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, simhash64(if (text == null) "" else text))
      }.toDF("id", "sh")
  }

  /** Candidate pairs sharing at least one of `blocks` equal-width SimHash
    * blocks. Emits (id_a, id_b, hamming), deduplicated.
    *
    * Recall guarantee (pigeonhole, before the bucket cap):
    *  - `probeBits = 0`: two docs within Hamming `blocks - 1` differ in
    *    zero bits of some block, so they share an exact block value.
    *  - `probeBits = 1` (multi-probe): two docs within Hamming
    *    `2*blocks - 1` differ in AT MOST ONE bit of some block
    *    (floor((2b-1)/b) = 1); the probe side additionally emits every
    *    single-bit flip of each block value, so the flipped probe of one
    *    doc equals the exact value of the other — they share a join key.
    *    Cost: the probe side grows by `64/blocks` rows per doc and each
    *    bucket join is `f_exact × f_probe` instead of `f²` — the classic
    *    multi-probe LSH trade (bigger index, derived recall bound),
    *    linear not quadratic in the probe count because only ONE join
    *    side is expanded.
    * The `maxBucketSize` cap can break either bound for pairs whose only
    * shared bucket is oversized — a true near-dup pair shares MANY of the
    * `blocks` blocks, so dropping its largest bucket almost never loses
    * the pair; pass `Int.MaxValue` when the bound must be unconditional.
    */
  def simhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      blocks: Int = 4, maxHamming: Int = 64,
      maxBucketSize: Int = 1000, probeBits: Int = 0,
      scope: CacheScope = CacheScope.session): DataFrame =
    // the expensive kernel (one simhash per doc) is the shared base of
    // both join sides — the core persists it, the block explodes are
    // cheap. The kernel input is `spread` (simhashDfJ): when the exact
    // side broadcasts, the bucket join's collision-production loop (the
    // dominant cost — ~4x the candidate count in raw join rows) streams
    // at this very partitioning.
    fingerprintCandidatePairs(simhashDfJ(df, idCol, textCol), blocks,
      maxHamming, maxBucketSize, probeBits, scope)

  /** The block-bucket candidate join over an ARBITRARY 64-bit
    * fingerprint frame `(id, sh)` — SimHash text fingerprints and
    * image perceptual hashes share this core (same pigeonhole recall
    * bounds, same skew cap, same multi-probe trade; see
    * [[simhashCandidatePairs]] for the derivations).
    */
  def fingerprintCandidatePairs(fpDf: DataFrame,
      blocks: Int = 4, maxHamming: Int = 64,
      maxBucketSize: Int = 1000, probeBits: Int = 0,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(blocks >= 2 && 64 % blocks == 0, "blocks must divide 64")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    val sc = CacheScope.resolve(scope, fpDf.sparkSession)
    val bits = 64 / blocks
    val mask = (1L << bits) - 1
    val withSh = sc.persist(fpDf.select(col("id"), col("sh")))
    def partCol(q: Int): Column =
      shiftright(col("sh"), q * bits).bitwiseAND(mask)
    // j = -1 → the exact block value; j >= 0 → that value with bit j
    // SET (multi-probe expansion, probe side only). Only 0→1 flips are
    // emitted: for a pair differing in one bit of a block, exactly one
    // side has a 0 there, and ITS set-flip equals the other side's exact
    // value — one collision suffices since pair orientation is
    // canonicalized below. Halves the probe rows vs flipping both ways.
    def explodedParts(flips: Boolean): DataFrame = {
      val js: Seq[Int] = if (flips) -1 until bits else Seq(-1)
      val structs = for { q <- 0 until blocks; j <- js } yield {
        val p = partCol(q)
        if (j < 0) struct(lit(q).as("q"), p.as("part"), lit(true).as("ok"))
        else {
          val f = p.bitwiseOR(lit(1L << j))
          struct(lit(q).as("q"), f.as("part"), (f =!= p).as("ok"))
        }
      }
      withSh.select(col("id"), col("sh"),
          explode(array(structs: _*)).as("bb"))
        .filter(col("bb.ok"))
        .select(col("id"), col("sh"), col("bb.q"), col("bb.part"))
    }
    val exact = explodedParts(flips = false)
    // skew guard: simhash bits are biased on real text, so a block value
    // can capture a large corpus fraction — f docs in one (q,part) bucket
    // emit f² join rows. Oversized buckets are measured on the EXACT
    // (corpus-distribution) side and anti-joined off both sides.
    // Broadcast anti-join on the (tiny) oversized list — no shuffle of
    // the bucket rows themselves.
    val oversized = exact.groupBy("q", "part").count()
      .filter(col("count") > maxBucketSize).select("q", "part")
    val l = exact.join(broadcast(oversized), Seq("q", "part"), "left_anti")
      .select(col("q"), col("part"), col("id").as("id_a"),
        col("sh").as("sh_a"))
    val r = (if (probeBits == 0) exact else explodedParts(flips = true))
      .join(broadcast(oversized), Seq("q", "part"), "left_anti")
      .select(col("q"), col("part"), col("id").as("id_b"),
        col("sh").as("sh_b"))
    // `=!=` + least/greatest (not `<`): under probing a pair collides in
    // BOTH orientations on different keys — keeping only one orientation
    // would lose the pair when the cap drops just its `<`-ordered bucket
    l.join(r, Seq("q", "part")).filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      // codegen'd bit_count filter BEFORE the distinct: a low-bit block
      // join can emit millions of junk pairs; dropping them here keeps the
      // distinct (a shuffle) proportional to the surviving pairs only
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup candidates: bucket by the 4 16-bit quarters (two
    * docs within Hamming distance 3 share at least one quarter), verify
    * by exact Hamming distance. The bucket cap is DISABLED here so the
    * pigeonhole guarantee stays unconditional — use
    * [[simhashCandidatePairs]] directly when skew-bounded candidate
    * generation matters more than total recall. Null texts hash as the
    * empty string (all-null docs therefore pair with each other at
    * Hamming 0 — dedup semantics for empty content).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashCandidatePairs(df, idCol, textCol, blocks = 4,
      maxHamming = maxHamming, maxBucketSize = Int.MaxValue)

  /** Derived SimHash operating point: the `blocks` choice covering
    * Hamming `radius` (with 1-bit probing, radius ≤ 2*blocks-1) whose
    * per-block key space still SPREADS the corpus, or None when no such
    * point exists — in which case SimHash is outside its envelope for
    * this (radius, corpus) and MinHash is the right tool.
    *
    * Envelope rule (measured in DEDUP_DRYRUN.md at 50k docs): block
    * bucketing holds its recall bound only while the skew cap stays
    * disengaged, i.e. `corpusSize * biasFactor <= maxBucketSize *
    * 2^(64/blocks)` — simhash bits are heavily biased on real text
    * (`biasFactor` ~10 covers the measured concentration), so capacity
    * is cap × key-space, not corpus ≤ key-space. Fewer blocks widen the
    * keys (better spread) but shrink the guaranteed radius, so the
    * radius constraint picks the SMALLEST feasible `blocks` and the
    * spread constraint then accepts or rejects it: a corpus needing both
    * a large radius and a large corpus has no valid point (the WWW'07
    * small-radius shape of SimHash).
    */
  /** Hamming radius the block join GUARANTEES to cover: `blocks - 1`
    * exact (pigeonhole over `blocks` blocks), `2*blocks - 1` with 1-bit
    * multi-probe (see [[simhashCandidatePairs]]). A prefilter beyond this
    * keeps pairs the candidate generation never promised to produce.
    */
  def guaranteedRadius(blocks: Int, probeBits: Int): Int = {
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    (probeBits + 1) * blocks - 1
  }

  def simhashOperatingPoint(radius: Int, corpusSize: Long,
      maxBucketSize: Int = 1000, biasFactor: Int = 10): Option[Int] = {
    require(radius >= 0 && radius <= 31, "radius must be in [0, 31]")
    // smallest divisor of 64 with 2*blocks-1 >= radius (widest keys)
    Seq(2, 4, 8, 16).find(b => 2 * b - 1 >= radius).filter(b =>
      simhashEnvelopeHolds(b, corpusSize, maxBucketSize, biasFactor))
  }

  /** The spread side of the envelope rule on its own: do `blocks`-wide
    * block keys still SPREAD a corpus of `corpusSize` docs, i.e.
    * `corpusSize * biasFactor <= maxBucketSize * 2^(64/blocks)`? (See
    * [[simhashOperatingPoint]] for the rationale and the DEDUP_DRYRUN
    * measurements behind `biasFactor`.)
    */
  def simhashEnvelopeHolds(blocks: Int, corpusSize: Long,
      maxBucketSize: Int, biasFactor: Int = 10): Boolean =
    BigInt(corpusSize) * biasFactor <=
      BigInt(maxBucketSize) * (BigInt(1) << (64 / blocks))

  /** The WIDEST-radius operating point a corpus supports — what a
    * persisted index derives at BUILD time, when the eventual query
    * radius is unknown: the LARGEST `blocks` (= largest guaranteed
    * radius `2*blocks-1`) whose block keys still spread `corpusSize`
    * docs. Candidates are {8, 4, 2}: blocks=16 would mean 4-bit keys
    * (16 distinct values — no selectivity at any size worth indexing),
    * and blocks=2 (32-bit keys) spreads anything real, so it is also
    * the fallback when even 16-bit keys saturate.
    */
  def simhashBlocksForCorpus(corpusSize: Long, maxBucketSize: Int = 1000,
      biasFactor: Int = 10): Int =
    Seq(8, 4).find(b =>
      simhashEnvelopeHolds(b, corpusSize, maxBucketSize, biasFactor))
      .getOrElse(2)

  /** SimHash as *candidate generation*, exact n-gram Jaccard as the
    * verifier: block-sharing candidates are re-checked against the true
    * shingle sets, so the output pair set is oracle-comparable (identical
    * to all-pairs Jaccard whenever every true pair shares a block and
    * passes the Hamming pre-filter). With `probeBits = 1` the candidate
    * bound is DERIVED, not empirical: every pair within Hamming
    * `2*blocks - 1` is guaranteed a shared join key (see
    * [[simhashCandidatePairs]]), so set `prefilterHamming = 2*blocks - 1`
    * and the pre-filter trims only candidates OUTSIDE the guarantee.
    * True Jaccard ≥0.8 pairs sit far below it (measured max Hamming 12
    * vs random ~32 at sf0.1; guarded by SimhashRecallSpec at the gate
    * SFs, which fails loudly if regenerated testdata moves the truth
    * past the bound).
    *
    * Scale note: pick `blocks` with [[simhashOperatingPoint]] — the
    * guaranteed radius (2*blocks-1) trades directly against per-block
    * key spread (2^(64/blocks) values vs corpus size). DEDUP_DRYRUN.md
    * measures both sides at 50k docs: blocks=8 saturates its 256-value
    * keys and collapses; blocks=4 holds its full guarantee with the cap
    * disengaged. When no blocks choice satisfies both constraints,
    * SimHash is outside its envelope — use [[minhashPairs]].
    */
  def simhashJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      blocks: Int = 4, prefilterHamming: Int = -1,
      maxBucketSize: Int = 1000, probeBits: Int = 1,
      verifyRankCap: Int = 0,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    // default prefilter = the DERIVED candidate bound: a caller passing
    // nothing gets a filter exactly as wide as what the generation
    // guarantees, never wider (prefilter > bound keeps pairs the join was
    // never promised to emit — wrong-by-default; prefilter < bound wastes
    // part of the guarantee). Explicit values still override for tuning.
    val pf = if (prefilterHamming < 0) guaranteedRadius(blocks, probeBits)
      else prefilterHamming
    val candAll = simhashCandidatePairs(df, idCol, textCol, blocks,
      maxHamming = pf, maxBucketSize = maxBucketSize,
      probeBits = probeBits, scope = sc)
    // Verify-density second tier (off by default): keep a candidate pair
    // only if it ranks within `verifyRankCap` by ascending exact Hamming
    // from AT LEAST ONE of its endpoints. On low-entropy corpora the
    // Hamming prefilter alone admits a dense candidate mass (sf0.1
    // synthetic: ~16% of ALL pairs within the bound) while true near-dups
    // rank at the very top of their endpoint's list (measured best-
    // endpoint rank p99=4, max=22 vs cap 32 — SimhashRankProfile); the
    // cap trims the dense junk BEFORE the expensive shingle-set join
    // instead of after. This is an empirical dial OUTSIDE the pigeonhole
    // guarantee (a true pair outranked at both endpoints by >cap closer
    // junk would be lost) — CI guards it against the planted truth at
    // the gate SFs (SimhashRecallSpec claim 4); leave 0 when the
    // candidate bound must be the only filter. Ranking windows partition
    // by each pair ORIENTATION (id_a side, id_b side): each window sees
    // a subset of the endpoint's true neighborhood, so ranks are never
    // larger than full-neighborhood ranks — recall-safe, and two narrow
    // window shuffles cost far less than the verify join they prune.
    val cand = rankCapPairs(candAll, verifyRankCap)
    // joined on both pair sides — persist so the shingle kernel runs once
    val texts = sc.persist(shingleSets(df, idCol, textCol, shingleSize))
    verifyPairs(cand, texts, threshold)
  }

  /** The verify-density second tier shared by the all-pairs and
    * incremental SimHash operators (see [[simhashJaccardPairs]] for the
    * rationale and recall evidence): keep a candidate only if it ranks
    * within `cap` by ascending Hamming from at least one endpoint.
    * `cap <= 0` disables (exact candidate-bound semantics).
    */
  private def rankCapPairs(cand: DataFrame, cap: Int): DataFrame =
    if (cap <= 0) cand.select("id_a", "id_b")
    else {
      // single frame with `rn_a <= cap || rn_b <= cap` — NOT two
      // rank-limited window branches unioned: that form lets each
      // branch plan as a WindowGroupLimit, but it duplicates the whole
      // candidate-generation subtree (exchange reuse does not reliably
      // dedupe it under AQE) and measured 2-4× slower at sf0.1
      val wA = Window.partitionBy("id_a")
        .orderBy(col("hamming").asc, col("id_b").asc)
      val wB = Window.partitionBy("id_b")
        .orderBy(col("hamming").asc, col("id_a").asc)
      cand.withColumn("rn_a", row_number().over(wA))
        .withColumn("rn_b", row_number().over(wB))
        .filter(col("rn_a") <= cap || col("rn_b") <= cap)
        .select("id_a", "id_b")
    }

  /** Incremental SimHash near-dup detection — the
    * [[minhashPairsIncremental]] shape for the SimHash index: a NEW batch
    * against an EXISTING corpus plus batch-internal pairs; corpus-internal
    * pairs are excluded (found when the corpus was indexed) and every
    * bucket join keeps the batch on one side, so cost scales with
    * |batch|, not |corpus|². Multi-probe expansion happens ONLY on the
    * batch side, with XOR (both-direction) bit flips covering both
    * orientations in a single join — see [[simhashIncrementalCore]].
    * Ids must be disjoint; batch ids come out as `id_a` for
    * batch-vs-corpus pairs, `a < b` for batch-internal.
    */
  def simhashPairsIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      shingleSize: Int = 3, blocks: Int = 4, prefilterHamming: Int = -1,
      maxBucketSize: Int = 1000, probeBits: Int = 1,
      verifyRankCap: Int = 0,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, batch.sparkSession)
    val sh = simhashDfJ(batch, idCol, textCol).withColumn("new", lit(true))
      .union(simhashDfJ(corpus, idCol, textCol)
        .withColumn("new", lit(false)))
    val texts = shingleSets(
      batch.select(col(idCol), col(textCol))
        .union(corpus.select(col(idCol), col(textCol))),
      idCol, textCol, shingleSize)
    simhashIncrementalCore(sh, texts, threshold, blocks, prefilterHamming,
      maxBucketSize, probeBits, verifyRankCap, sc)
  }

  /** Persist a SimHash text index: the corpus's 64-bit fingerprints and
    * shingle sets as parquet plus a params sidecar. The fingerprint
    * table is TINY (16 bytes/doc) — block explodes and multi-probe
    * expansion happen at query time from it, so `blocks`/`probeBits`
    * remain query-time OVERRIDES; but the index derives and STORES its
    * operating point (`blocks` from corpus size via
    * [[simhashBlocksForCorpus]] when not pinned), because an index
    * outlives the corpus-size knowledge of whoever queries it: a reader
    * defaulting to the stored point can never carry a saturated block
    * count past its envelope (the silent-collapse mode DEDUP_DRYRUN.md
    * measures at blocks=8 / 50k docs). `shingleSize` is index identity
    * (baked into the persisted shingle sets the verify stage joins);
    * `nDocs` is stored so reads can VALIDATE explicit overrides.
    */
  def writeSimhashIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleSize: Int = 3, blocks: Int = -1,
      probeBits: Int = 1, maxBucketSize: Int = 1000): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // validate the operating point BEFORE ANY write: the envelope needs
    // only the corpus row count (one cheap count pass, no kernel), and a
    // refused pinned point must leave the target path UNTOUCHED — an
    // in-place rebuild of a live index would otherwise destroy the old
    // fingerprints before discovering the new point is saturated
    val nDocs = corpus.count()
    val b = if (blocks > 0) blocks
      else simhashBlocksForCorpus(nDocs, maxBucketSize)
    require(simhashEnvelopeHolds(b, nDocs, maxBucketSize),
      s"simhash index point blocks=$b saturates ${64 / b}-bit block " +
        s"keys at $nDocs docs (maxBucketSize=$maxBucketSize) — the " +
        "skew cap would silently drop in-guarantee candidates; lower " +
        "blocks or raise maxBucketSize")
    simhashDfJ(corpus, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/fingerprints")
    shingleSets(corpus, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$path/shingles")
    Seq((shingleSize, b, probeBits, maxBucketSize, nDocs))
      .toDF("shingleSize", "blocks", "probeBits", "maxBucketSize", "nDocs")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental SimHash near-dup pairs of a NEW batch against a
    * PERSISTED corpus index ([[writeSimhashIndex]]) — the
    * [[minhashPairsFromIndex]] shape for the SimHash family: identical
    * output contract to [[simhashPairsIncremental]], corpus side read
    * from the index scan (no corpus re-hash per batch).
    *
    * `blocks`/`probeBits`/`maxBucketSize` default to the point the index
    * DERIVED AND STORED at build time (pass -1 = "use the index's").
    * Explicit overrides are VALIDATED against the indexed corpus size:
    * a block count whose key space the stored corpus saturates is
    * refused loudly rather than silently dropping in-guarantee
    * candidates — the failure mode an index FREEZES without this check,
    * since its corpus only grows after build.
    */
  def simhashPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, blocks: Int = -1, prefilterHamming: Int = -1,
      maxBucketSize: Int = -1, probeBits: Int = -1,
      verifyRankCap: Int = 0,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, spark)
    val params = spark.read.json(s"$path/params").head()
    def stored(field: String, legacy: Long): Long =
      if (params.schema.fieldNames.contains(field))
        params.getAs[Long](field)
      else legacy // pre-params-sidecar index layouts
    val shingleSize = params.getAs[Long]("shingleSize").toInt
    val b = if (blocks > 0) blocks else stored("blocks", 4L).toInt
    val pb = if (probeBits >= 0) probeBits else stored("probeBits", 1L).toInt
    val cap = if (maxBucketSize > 0) maxBucketSize
      else stored("maxBucketSize", 1000L).toInt
    val nDocs = stored("nDocs", -1L)
    require(nDocs < 0 || simhashEnvelopeHolds(b, nDocs, cap),
      s"simhash index at $path holds $nDocs docs: blocks=$b gives " +
        s"${64 / b}-bit block keys the corpus saturates " +
        s"(maxBucketSize=$cap) and the skew cap would silently drop " +
        "in-guarantee candidates — use the index's stored point " +
        s"(blocks=${stored("blocks", 4L)}) or rebuild with a larger " +
        "maxBucketSize")
    val sh = simhashDfJ(batch, idCol, textCol).withColumn("new", lit(true))
      .union(dropTombstoned(spark, path,
          spark.read.parquet(s"$path/fingerprints"), "id")
        .withColumn("new", lit(false)))
    val texts = shingleSets(batch.select(col(idCol), col(textCol)),
        idCol, textCol, shingleSize)
      .union(dropTombstoned(spark, path,
        spark.read.parquet(s"$path/shingles"), "id"))
    simhashIncrementalCore(sh, texts, threshold, b, prefilterHamming,
      cap, pb, verifyRankCap, sc)
  }

  /** Shared incremental SimHash core over an (id, sh, new) fingerprint
    * frame — however the corpus rows were produced (kernel pass or index
    * scan).
    *
    * ONE join covers both multi-probe orientations: the batch probe side
    * emits each block value XOR'd with every single bit (BOTH flip
    * directions, unlike the symmetric all-pairs operator's 0→1-only
    * trick). For a (batch, corpus) pair differing in ≤1 bit of some
    * block, either the values are equal (exact–exact collision) or the
    * batch value XOR that bit EQUALS the corpus value — whichever side
    * holds the 0. Cost: probe expansion is `batch × blocks × (bits+1)`
    * rows — proportional to the BATCH; the corpus side stays exact-only
    * (the earlier two-join form exploded the CORPUS with flips for the
    * second orientation, a corpus-sized blowup exactly where the
    * incremental contract promises batch-sized cost).
    */
  private def simhashIncrementalCore(sh0: DataFrame, texts: DataFrame,
      threshold: Double, blocks: Int, prefilterHamming: Int,
      maxBucketSize: Int, probeBits: Int, verifyRankCap: Int,
      sc: CacheScope): DataFrame = {
    // default prefilter = the derived bound (see simhashJaccardPairs)
    val pf = if (prefilterHamming < 0) guaranteedRadius(blocks, probeBits)
      else prefilterHamming
    val cand = fingerprintIncrementalCandidates(sh0, blocks, pf,
      maxBucketSize, probeBits, sc)
    verifyPairs(rankCapPairs(cand, verifyRankCap), sc.persist(texts),
      threshold)
  }

  /** Incremental block-bucket candidates over an `(id, sh, new)`
    * fingerprint frame — the batch-sized-cost core shared by the
    * incremental SimHash operators and the image-fingerprint family
    * (see [[simhashPairsIncremental]] for the XOR multi-probe
    * derivation). Emits `(id_a, id_b, hamming <= maxHamming)`
    * deduplicated, batch id first for batch-vs-corpus pairs, `a < b`
    * for batch-internal.
    */
  def fingerprintIncrementalCandidates(sh0: DataFrame, blocks: Int,
      maxHamming: Int, maxBucketSize: Int, probeBits: Int,
      sc: CacheScope): DataFrame = {
    require(blocks >= 2 && 64 % blocks == 0, "blocks must divide 64")
    require(probeBits == 0 || probeBits == 1, "probeBits must be 0 or 1")
    val bits = 64 / blocks
    val mask = (1L << bits) - 1
    val sh = sc.persist(sh0)
    def partCol(q: Int): Column =
      shiftright(col("sh"), q * bits).bitwiseAND(mask)
    // j = -1 → exact block value; j >= 0 → value with bit j FLIPPED
    // (XOR — both directions, see scaladoc)
    def parts(src: DataFrame, flips: Boolean): DataFrame = {
      val js: Seq[Int] =
        if (flips && probeBits == 1) -1 until bits else Seq(-1)
      val structs = for { q <- 0 until blocks; j <- js } yield {
        val p = partCol(q)
        if (j < 0) struct(lit(q).as("q"), p.as("part"))
        else struct(lit(q).as("q"),
          p.bitwiseXOR(lit(1L << j)).as("part"))
      }
      src.select(col("id"), col("sh"), col("new"),
          explode(array(structs: _*)).as("bb"))
        .select(col("id"), col("sh"), col("new"), col("bb.q"),
          col("bb.part"))
    }
    val exactAll = parts(sh, flips = false)
    val oversized = exactAll.groupBy("q", "part").count()
      .filter(col("count") > maxBucketSize).select("q", "part")
    def bounded(df: DataFrame): DataFrame =
      df.join(broadcast(oversized), Seq("q", "part"), "left_anti")
    val l = bounded(exactAll)
      .select(col("q"), col("part"), col("id").as("id_x"),
        col("sh").as("sh_x"), col("new").as("new_x"))
    val r = bounded(parts(sh.filter(col("new")), flips = true))
      .select(col("q"), col("part"), col("id").as("id_y"),
        col("sh").as("sh_y"), col("new").as("new_y"))
    l.join(r, Seq("q", "part"))
      .filter(col("id_x") =!= col("id_y"))
      // y is always a batch doc; batch id first for batch-vs-corpus,
      // a<b when both are batch
      .select(
        when(col("new_x"), least(col("id_x"), col("id_y")))
          .otherwise(col("id_y")).as("id_a"),
        when(col("new_x"), greatest(col("id_x"), col("id_y")))
          .otherwise(col("id_x")).as("id_b"),
        bit_count(col("sh_x").bitwiseXOR(col("sh_y"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  // -------------------------------------------------------------------
  // embedding near-dup
  // -------------------------------------------------------------------

  /** Near-duplicate embedding pairs by cosine ≥ threshold, bucketed by
    * random-hyperplane LSH. Signature and cosine run as JVM kernels
    * ([[Similarity.hyperplaneBucketsDf]] / Similarity.cosineJ) — the
    * Catalyst-lambda forms interpret per element, ~10× slower on this
    * hot path. Candidates are deduped BEFORE the cosine verify so each
    * pair is scored once regardless of how many tables it collides in.
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nBits: Int = 12,
      tables: Int = 4, scope: CacheScope = CacheScope.session): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sc = CacheScope.resolve(scope, spark)
    val withBuckets = sc.persist( // used by both join sides
      Similarity.hyperplaneBucketsDf(df, idCol, vecCol, dim, nBits, tables))
    val l = withBuckets.select(col("t"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val r = withBuckets.select(col("t"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("t", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "v_a", "id_b", "v_b").distinct()
      // codegen'd native cosine — no typed-map boundary in the verify
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.cosineC(col("v_a"), col("v_b"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Incremental (batch-vs-corpus) variant of [[embeddingPairs]],
    * completing the family symmetry with [[minhashPairsIncremental]] and
    * [[simhashPairsIncremental]]: corpus-internal pairs are excluded,
    * batch-internal pairs appear once (`id_a < id_b`), batch-vs-corpus
    * pairs carry the batch id first. The hyperplane seeds are fixed per
    * table, so batch and corpus signatures land in comparable buckets
    * without re-indexing the corpus; every bucket join keeps the batch on
    * one side, so candidate cost scales with |batch|, and `maxBucketSize`
    * drops degenerate buckets (the same guard as the text indexes).
    */
  def embeddingPairsIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, threshold: Double = 0.95,
      nBits: Int = 12, tables: Int = 4,
      maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, batch.sparkSession)
    val all0 =
      Similarity.hyperplaneBucketsDf(batch, idCol, vecCol,
        dim, nBits, tables).withColumn("new", lit(true))
      .union(Similarity.hyperplaneBucketsDf(corpus, idCol, vecCol,
        dim, nBits, tables).withColumn("new", lit(false)))
    embeddingIncrementalCore(all0, threshold, maxBucketSize, sc)
  }

  /** Persist a hyperplane-LSH embedding index: the corpus's per-table
    * bucket rows (with vectors) as parquet plus a params sidecar. The
    * hyperplane seeds are fixed per table, so a later batch signed with
    * the same (dim, nBits, tables) lands in comparable buckets — those
    * three are the index identity.
    */
  def writeEmbeddingIndex(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, dim: Int, nBits: Int = 12, tables: Int = 4): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Similarity.hyperplaneBucketsDf(corpus, idCol, vecCol, dim, nBits,
        tables)
      .write.mode("overwrite").parquet(s"$path/buckets")
    Seq((dim, nBits, tables)).toDF("dim", "nBits", "tables").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

  /** Incremental embedding near-dup pairs of a NEW batch against a
    * PERSISTED corpus index ([[writeEmbeddingIndex]]) — identical output
    * contract to [[embeddingPairsIncremental]], corpus side read from
    * the index scan (no corpus re-signing per batch).
    */
  def embeddingPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, maxBucketSize: Int = 1000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, spark)
    val p = spark.read.json(s"$path/params").head()
    val all0 = Similarity.hyperplaneBucketsDf(batch, idCol, vecCol,
        p.getAs[Long]("dim").toInt, p.getAs[Long]("nBits").toInt,
        p.getAs[Long]("tables").toInt).withColumn("new", lit(true))
      .union(dropTombstoned(spark, path,
          spark.read.parquet(s"$path/buckets"), "id")
        .withColumn("new", lit(false)))
    embeddingIncrementalCore(all0, threshold, maxBucketSize, sc)
  }

  /** Shared incremental embedding core over (t, bucket, id, v, new)
    * bucket rows — kernel pass or index scan on the corpus side.
    */
  private def embeddingIncrementalCore(all0: DataFrame, threshold: Double,
      maxBucketSize: Int, sc: CacheScope): DataFrame = {
    val cached = sc.persist(all0)
    val oversized = cached.groupBy("t", "bucket").count()
      .filter(col("count") > maxBucketSize).select("t", "bucket")
    val all = cached
      .join(broadcast(oversized), Seq("t", "bucket"), "left_anti")
    val l = all.filter(col("new")).select(col("t"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val r = all.select(col("t"), col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("new").as("new_b"))
    l.join(r, Seq("t", "bucket"))
      // batch-internal pairs once (a < b); batch-vs-corpus always
      .filter((col("new_b") && col("id_a") < col("id_b")) ||
        (!col("new_b") && col("id_a") =!= col("id_b")))
      .select("id_a", "v_a", "id_b", "v_b").distinct()
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.cosineC(col("v_a"), col("v_b"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // -------------------------------------------------------------------
  // semantic dedup (k-means-cell partitioned)
  // -------------------------------------------------------------------

  /** SemDeDup-shaped semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): partition the embedding space into k-means
    * cells — the SAME coarse quantizer IVF search uses
    * ([[Similarity.trainIvfCentroids]]) — and verify cosine pairs ONLY
    * within each cell. Where [[embeddingPairs]] buckets by random
    * hyperplanes (probabilistic, multi-table), this buckets by LEARNED
    * structure: one deterministic cell per vector, so the candidate
    * join is a single self-join keyed by `cid` and the pair cost is
    * Σ cellSize² — bounded by choosing k ~ corpus/1000 at index-build
    * time. A pair straddling a cell boundary is invisible by design;
    * that is the published approximation, and it is exact whenever
    * near-duplicate vectors co-assign (always true for scale-clones:
    * assignment is by cosine, which is scale-invariant).
    *
    * The per-cell quadratic blow-up is the operator's one scale
    * hazard, so cell sizes are CHECKED, not hoped: any cell above
    * `maxCellSize` fails fast with the offending sizes (re-train with
    * larger k, or 0 to opt out). The size audit shares one scan with
    * the join via the scoped persist of the assignment. The default cap
    * of 10000 admits at most ~5e7 cosine evaluations per cell (~one
    * task-minute of 64-dim dot products) — a ceiling an executor
    * actually survives; the earlier 100000 default nominally allowed
    * ~5e9 per-cell pairs, far past the "k ~ corpus/1000" sizing story.
    * Raise it explicitly only with cluster capacity to match.
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double = 0.95,
      maxCellSize: Int = 10000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val assigned = sc.persist(
      Similarity.ivfAssignDf(df, idCol, vecCol, centroids))
    if (maxCellSize > 0) {
      val over = assigned.groupBy("cid").count()
        .filter(col("count") > maxCellSize)
        .orderBy(col("count").desc).limit(5).collect()
      if (over.nonEmpty) {
        // refusal path: drop the pinned assignment NOW — a caller that
        // catches the error and retries with larger k must not
        // accumulate one dead cache per failed attempt (the later scope
        // close double-unpersists harmlessly)
        assigned.unpersist(blocking = false)
        throw new IllegalArgumentException(
          s"requirement failed: semantic dedup cells over " +
            s"maxCellSize=$maxCellSize: " +
            over.map(r => s"cid=${r.get(0)} size=${r.getLong(1)}")
              .mkString(", ") +
            " — re-train centroids with larger k, or pass maxCellSize=0")
      }
    }
    val l = assigned.select(col("cid"), col("id").as("id_a"),
      col("v").as("v_a"))
    val r = assigned.select(col("cid"), col("id").as("id_b"),
      col("v").as("v_b"))
    l.join(r, Seq("cid")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorExpressions.cosineC(col("v_a"), col("v_b"))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The dedup that follows [[semanticPairs]]: drop the HIGHER id of
    * every verified pair (the family-wide drop rule), keep everything
    * else. Returns `df` minus dropped rows — the drop set rides a
    * broadcast-able anti-join.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double = 0.95,
      maxCellSize: Int = 10000,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val drops = semanticPairs(df, idCol, vecCol, centroids, threshold,
        maxCellSize, scope)
      .select(col("id_b").as("_drop_id")).distinct()
    df.join(drops, col(idCol).cast("long") === col("_drop_id"),
      "left_anti")
  }
}
