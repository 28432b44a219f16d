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

  /** Keep one row per distinct content (the min-id row). */
  def dropExactDuplicates(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
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
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => xxhash64(s)))

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
      shingleSize: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val buckets = lshBuckets(df, idCol, textCol, numHashes, bands,
      shingleSize)
    val bounded = buckets.withColumn("bsz",
      count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bsz") <= maxBucketSize)
    val l = bounded.select(col("band"), col("bucket"),
      col(idCol).as("id_a"))
    val r = bounded.select(col("band"), col("bucket"),
      col(idCol).as("id_b"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val texts = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("sh"))
    cand
      .join(texts.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), "id_a")
      .join(texts.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** All near-dup pairs by exact n-gram Jaccard with length-bucket blocking:
    * docs with Jaccard ≥ t must have shingle counts within a factor of
    * ~1/t, so only adjacent power-of-1.3 length buckets are compared.
    * Oracle-friendly (no hashing) yet never all-pairs at scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleSize).as("sh"))
      .withColumn("nsh", size(col("sh")))
      .withColumn("bucket",
        floor(log(col("nsh").cast("double") + 1) / math.log(1.3))
          .cast(LongType))
    val probes = base.select(col("id"), col("sh"), col("nsh"),
      explode(array(col("bucket"), col("bucket") + 1)).as("probe"))
    val l = probes.select(col("probe"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val r = base.select(col("bucket").as("probe"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    l.join(r, "probe")
      // normalize orientation before dedup: the probe side is asymmetric
      // (each doc probes its own and the next bucket), so the smaller id
      // can appear on either side of the join
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("jaccard"))
      .distinct()
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

  /** SimHash near-dup candidates: bucket by the 4 16-bit quarters (two
    * docs within Hamming distance 3 share at least one quarter), verify
    * by exact Hamming distance.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSh = simhashDf(df, idCol, textCol)
    val quarters = withSh.select(col("id"), col("sh"),
      explode(array((0 until 4).map(q => struct(lit(q).as("q"),
        shiftright(col("sh"), q * 16).bitwiseAND(0xffffL).as("part"))): _*))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.q"), col("bb.part"))
    val l = quarters.select(col("q"), col("part"), col("id").as("id_a"),
      col("sh").as("sh_a"))
    val r = quarters.select(col("q"), col("part"), col("id").as("id_b"),
      col("sh").as("sh_b"))
    l.join(r, Seq("q", "part")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // -------------------------------------------------------------------
  // embedding near-dup
  // -------------------------------------------------------------------

  /** Near-duplicate embedding pairs by cosine ≥ threshold, bucketed by
    * random-hyperplane LSH (see [[Similarity.hyperplaneBucket]]).
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nBits: Int = 12,
      tables: Int = 4): DataFrame = {
    val withBuckets = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          Similarity.hyperplaneBucket(col(vecCol), dim, nBits,
            seed = 7919 * (t + 1)).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.t"), col("bb.bucket"))
    val l = withBuckets.select(col("t"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val r = withBuckets.select(col("t"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("t", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("v_a"), col("v_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}
