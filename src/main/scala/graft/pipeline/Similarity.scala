package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`/`array<double>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query side so
  * the big table is scanned once with no shuffle; the LSH path buckets both
  * sides by random-hyperplane signatures so candidate generation is a hash
  * join, never a cartesian product.
  */
object Similarity {

  /** Dot product via zip_with + aggregate (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Deterministic pseudo-random hyperplane `j` of dimension `dim`:
    * component i ∈ {-1, +1} derived from xxhash64 of (seed, j, i).
    * Rademacher hyperplanes preserve cosine-LSH guarantees and keep the
    * plane a compact literal in the plan.
    */
  private def hyperplane(dim: Int, j: Int, seed: Long): Seq[Double] = {
    (0 until dim).map { i =>
      val h = scala.util.hashing.byteswap64(seed ^ (j.toLong << 32) ^ i)
      if (h >= 0) 1.0 else -1.0
    }
  }

  /** `nBits`-bit random-hyperplane signature of a vector (sign of the dot
    * product with each plane packed into a long).
    */
  def hyperplaneBucket(v: Column, dim: Int, nBits: Int,
      seed: Long = 42L): Column = {
    val bits = (0 until nBits).map { j =>
      val plane = hyperplane(dim, j, seed)
      val d = aggregate(
        zip_with(v, typedLit(plane), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact top-k cosine neighbors for each query vector. The query side is
    * broadcast (must be small); the corpus is scanned once, no shuffle
    * until the final per-query top-k.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qIdCol).as("query_id"),
        col(qVecCol).as("qv"))))
      .withColumn("cosine", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates share a hyperplane bucket
    * in at least one of `tables` hash tables; exact cosine re-ranks the
    * candidates. Trades recall for never touching the full corpus per
    * query — the scale path for 100 TB (bucket join, then per-query top-k).
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, dim: Int, nBits: Int = 10, tables: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, vec: String, idAs: String,
        vAs: String): DataFrame =
      df.select(col(id).as(idAs), col(vec).as(vAs),
        explode(array((0 until tables).map(t => struct(lit(t).as("t"),
          hyperplaneBucket(col(vec), dim, nBits, seed = 7919 * (t + 1))
            .as("bucket"))): _*)).as("bb"))
        .select(col(idAs), col(vAs), col("bb.t"), col("bb.bucket"))
    val cb = buckets(corpus, idCol, vecCol, "id", "v")
    val qb = buckets(queries, qIdCol, qVecCol, "query_id", "qv")
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .select("query_id", "qv", "id", "v").distinct()
      .withColumn("cosine", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }
}
