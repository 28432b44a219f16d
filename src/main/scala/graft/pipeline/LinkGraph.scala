package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim

/** Link-graph authority scoring — fixed-point PageRank (Brin & Page
  * 1998, public literature) over an edge frame: the classic web-corpus
  * CURATION signal (domain authority gates crawl frontier priority and
  * document quality weighting in the published web-corpus recipes).
  *
  * Exactness design (the repo's quantized-long discipline): ranks are
  * integers in PARTS-PER-1e12 of total mass and every update step is
  * integer arithmetic — `share(u) = (r·d_micro) div (1e6·outdeg)`,
  * `r'(v) = base + Σ share` — so any engine replays training
  * bit-for-bit (sums of longs are order-independent; `div` is exact
  * integral division, never a floored double). Magnitude budget:
  * `r ≤ 1e12`, `r·d_micro ≤ 8.5e17 < 2^63`.
  *
  * Semantics (pinned, documented):
  *  - parallel edges collapse (the edge set is `distinct`) and
  *    self-loops are dropped; rows with a NULL endpoint are ignored
  *    (the pair-generator null rule);
  *  - the node set is every id mentioned on either side;
  *  - DANGLING nodes (no out-edges): two pinned variants.
  *    `redistributeDangling = false` (default) leaks their damped mass
  *    — the simple-sink shape: total mass is NOT conserved, which
  *    biases absolute ranks low but preserves the authority ORDER and
  *    costs nothing extra. `redistributeDangling = true` is standard
  *    PageRank: each round pays ONE extra aggregate (the dangling
  *    ranks' sum `D` — a single long to the driver) and every node
  *    gains the exact integral share `(D·d_micro) div (1e6·n)`; only
  *    the div remainders leak (< 1 part-per-1e12 per share/base/extra
  *    term), so mass is conserved up to `edges + 2n` parts per round —
  *    the bound LinkGraphSpec pins. Absolute ranks are then comparable
  *    across snapshots with different dangling fractions.
  *
  * Scale design (100 TB): no driver-side graph state — each iteration
  * is `edges ⋈ ranks` (shuffle on src), a `groupBy(dst)` partial-sum
  * aggregation, and a left join back to the node set; lineage is cut
  * per round with `localCheckpoint` (the [[Clustering]] discipline) so
  * plan depth stays constant across iterations. Skewed in-degree (a
  * hub page) is a map-side-combined SUM — the aggregation handles it;
  * skewed OUT-degree rows fan out of the join as they must.
  */
object LinkGraph {

  /** Total rank mass (parts-per-1e12) and the damping in micro-units. */
  val massTotal: Long = 1000000000000L
  val dampingMicroDefault: Int = 850000

  private def divL(a: Column, b: Column): Column =
    graftshim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        graftshim.expression(a), graftshim.expression(b)))

  /** `(id, rank)` after `iters` fixed-point PageRank rounds; `rank` is
    * an exact long in parts-per-1e12 of initial total mass.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampingMicro: Int = dampingMicroDefault,
      redistributeDangling: Boolean = false,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampingMicro >= 0 && dampingMicro <= 1000000,
      s"dampingMicro $dampingMicro out of [0, 1e6]")
    val sc = CacheScope.resolve(scope, edges.sparkSession)
    val e = sc.persist(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct())
    val nodes = sc.persist(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val outDeg = sc.persist(
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg")))
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = massTotal / n // exact long division
    val base = (massTotal * (1000000L - dampingMicro)) / (1000000L * n)
    var ranks = nodes.withColumn("r", lit(r0)).localCheckpoint()
    for (_ <- 1 to iters) {
      // exact dangling redistribution: one aggregate of the dangling
      // ranks (a single long crosses to the driver), every node gains
      // (D·d_micro) div (1e6·n) — magnitude D·d_micro ≤ 8.5e17 < 2^63
      val extra =
        if (!redistributeDangling) 0L
        else {
          val d = ranks.join(outDeg, Seq("id"), "left_anti")
            .agg(coalesce(sum("r"), lit(0L)).as("d"))
            .head().getLong(0)
          (d * dampingMicro) / (1000000L * n)
        }
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          divL(col("r") * lit(dampingMicro.toLong),
            lit(1000000L) * col("outdeg")).as("share"))
        .groupBy("id").agg(sum("share").as("inflow"))
      val next = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base + extra) + coalesce(col("inflow"), lit(0L))).as("r"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
    }
    ranks
  }

  /** Top-`k` authorities: `(id, rank, position)` — the dashboard cut. */
  def topAuthorities(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val r = pageRank(edges, srcCol, dstCol, iters)
    r.orderBy(desc("r"), col("id")).limit(k)
      .withColumn("position",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("r"), col("id"))))
  }
}
