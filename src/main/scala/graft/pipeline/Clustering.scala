package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-cluster construction: connected components over a near-dup
  * pair set, and the keep-set that falls out of it.
  *
  * The pair generators ([[Dedup.ngramJaccardPairs]], [[Dedup.minhashPairs]],
  * [[Dedup.simhashJaccardPairs]], [[Dedup.embeddingNearDupPairs]]) emit
  * verified EDGES; a curation keep-decision needs the transitive closure —
  * A~B and B~C must land A, B, C in ONE cluster even when (A,C) itself
  * fell under the threshold, or the kept corpus retains B-shaped bridges
  * of every near-dup chain. [[Curation.curate]] deliberately uses the
  * single-pass pair rule (replicable in a windowless oracle); this module
  * is the transitive complement for callers that want true clusters.
  *
  * Scale design (100 TB): alternating large-star / small-star edge
  * contraction — the MapReduce connected-components algorithm of Kiveris
  * et al. (MapReduce and Beyond, 2014), public literature — which
  * converges in O(log^2 n) rounds with only per-key `groupBy`/`join`
  * shuffles, no driver-side graph state, no `collect()`. Each round's
  * edge set is persisted, fingerprinted for the convergence test (one
  * small aggregate action), and the previous round is unpersisted before
  * the next shuffle, so peak storage is two edge sets regardless of round
  * count. High-degree nodes (a viral boilerplate cluster) are exactly the
  * case large-star exists for: every round points the tail of a big star
  * at the component minimum, halving path lengths without ever building a
  * neighbor list wider than one shuffle partition's stream.
  */
object Clustering {

  /** Connected-component labels for every node mentioned in `pairs`:
    * `(id, cluster_id)` with `cluster_id` = the component's minimum id —
    * deterministic, join-stable, and the conventional keeper choice.
    *
    * `pairs` rows with a null endpoint are ignored (a null id cannot
    * name a document; dropping the edge, not the run, mirrors the
    * null-key rule of the pair generators). Self-pairs are ignored.
    *
    * @param maxIterations hard cap on star rounds; the algorithm's bound
    *        is O(log^2 n) so the default 30 covers any physical corpus —
    *        hitting the cap throws rather than returning wrong labels.
    */
  def connectedComponents(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIterations: Int = 30,
      scope: CacheScope = CacheScope.session): DataFrame =
    connectedComponentsStats(pairs, aCol, bCol, maxIterations, scope)._1

  /** [[connectedComponents]] plus the number of star rounds it took to
    * converge — scale-evidence instrumentation (a round = one
    * large-star + small-star pass = a bounded number of shuffles, so
    * rounds × shuffle cost is the operator's scale model).
    */
  def connectedComponentsStats(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIterations: Int = 30,
      scope: CacheScope = CacheScope.session): (DataFrame, Int) = {
    val sc = CacheScope.resolve(scope, pairs.sparkSession)

    // canonical undirected edge (lo < hi), nulls and self-loops dropped.
    // Every round is localCheckpoint'ed, NOT merely persisted: an
    // iterative plan that nests the previous round's lineage doubles the
    // logical tree each round — by round ~10 even the plan STRING is
    // heap-killing, and a lost executor would recompute the whole tower.
    // Checkpointing cuts the lineage to the materialized blocks (the
    // standard Spark idiom for iterative graph algorithms); superseded
    // rounds' blocks are dropped by the ContextCleaner once unreferenced.
    val a = col(aCol).cast("long"); val b = col(bCol).cast("long")
    var edges = pairs
      .filter(a.isNotNull && b.isNotNull && a =!= b)
      .select(least(a, b).as("lo"), greatest(a, b).as("hi"))
      .distinct()
      .localCheckpoint(true)
    var fp = fingerprint(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIterations) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nfp = fingerprint(next)
      converged = nfp == fp
      edges = next
      fp = nfp
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds " +
          "(bound is O(log^2 n); this indicates a bug, not a big graph)")
    // converged star edges are exactly (root, member): labels read off
    // directly; roots name themselves
    val members = edges.select(col("hi").as("id"), col("lo").as("cluster_id"))
    val roots = edges.select(col("lo").as("id")).distinct()
      .join(edges.select(col("hi").as("id")).distinct(), Seq("id"),
        "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    (sc.persist(members.union(roots)), rounds)
  }

  /** Large-star round: for every node u with undirected neighborhood
    * G(u), connect each neighbor LARGER than u to m = min(G(u) + {u}).
    * Emitted edges already satisfy lo < hi (m <= u < v).
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val nb = edges.select(col("lo").as("u"), col("hi").as("v"))
      .union(edges.select(col("hi").as("u"), col("lo").as("v")))
    val mins = nb.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    nb.join(mins, "u")
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("m").as("lo"), col("v").as("hi"))
      .distinct()
  }

  /** Small-star round: for every node u over its STRICTLY SMALLER
    * neighbors N(u) (the canonical lo<hi orientation read from the hi
    * side), connect each of N(u) + {u} except m = min(N(u)) to m.
    * Emitted edges satisfy lo < hi (m is the strict minimum).
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val dir = edges.select(col("hi").as("u"), col("lo").as("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("m").as("lo"), col("v").as("hi"))
      .union(mins.select(col("m").as("lo"), col("u").as("hi")))
      .distinct()
  }

  /** Order-insensitive edge-set fingerprint: (count, xor of row hashes).
    * XOR is the commutative fold that cannot overflow (a summed hash
    * would throw under ANSI arithmetic), computed in one
    * partial-aggregated pass. A collision between two CONSECUTIVE
    * rounds' differing edge sets (~2⁻⁶⁴ per round, count must also
    * match) would end the loop one round early with non-star edges
    * still present — wrong labels, not just wasted work — which is why
    * the xor rides with the exact count and 64-bit xxhash64 rather
    * than a narrower digest.
    */
  private def fingerprint(edges: DataFrame): (Long, Long) = {
    val s = edges.agg(count(lit(1)).cast("long").as("n"),
      coalesce(expr("bit_xor(xxhash64(lo, hi))"), lit(0L)).as("h"))
      .head()
    (s.getLong(0), s.getLong(1))
  }

  /** Per-document cluster labels for a WHOLE corpus: every `docs` row gets
    * `(idCol, cluster_id, is_canonical)`; documents in no near-dup pair
    * are their own singleton cluster. The keep-set is
    * `filter(col("is_canonical"))` — one survivor (the min id) per
    * transitive near-dup cluster.
    */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      scope: CacheScope = CacheScope.session): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol, scope = scope)
      .withColumnRenamed("id", "__cc_id")
    val id = col(idCol).cast("long")
    docs.select(id.as(idCol))
      .join(labels, id === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }
}
