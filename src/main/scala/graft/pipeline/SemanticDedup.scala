package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** SemDeDup-shaped semantic dedup (Abbas et al. 2023): k-means-cell
  * partitioned cosine verification — learned structure instead of
  * random hyperplanes.
  */
private[pipeline] trait SemanticDedupOps extends Serializable { this: Dedup.type =>

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
