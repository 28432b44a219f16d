package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Distributed fixed-point k-means over an embedding column — the corpus
  * ORGANIZATION operator: topical clusters for mixture balancing,
  * cluster-diverse sampling for training prep, and per-cluster stats for
  * curation dashboards. (The IVF *index* trains its centroids on a
  * bounded driver-side sample — [[Similarity.trainIvfCentroids]] — which
  * is the right cost model for an index; THIS operator runs Lloyd rounds
  * over the FULL corpus, because cluster populations are the product.)
  *
  * Scale design (100 TB): each Lloyd round is one corpus scan —
  * assignment is map-only (small models inline as plan literals scored
  * by the codegen'd [[graft.functions.LongDotProduct]] kernel; past
  * [[literalComponentCap]] total components the matrix rides a codegen
  * REFERENCE instead — see [[assignmentColumns]]), and the
  * centroid update reduces `(cid, pos)` partial sums map-side before one
  * tiny shuffle of `k × dim` rows; the driver holds only the `k × dim`
  * centroid matrix. No iteration ever materializes per-document state
  * beyond one `cid` column.
  *
  * Exactness design (the repo's quantized-long discipline): components
  * quantize as `floor(x · scale + 0.5)` — every step an IEEE-defined
  * double op, so any engine replays it bit-identically — and centroids
  * stay exact long vectors (floor of the per-cluster mean). Assignment
  * scores are `dot(v,m) / sqrt(dot(m,m))` where both dot products are
  * exact integers below 2^53: the division and square root are correctly
  * rounded IEEE ops, so the argmax (ties → lowest cluster index) is
  * engine-independent — a DuckDB oracle replays training *and*
  * assignment exactly. `dot/|m|` is a positive rescale of cosine per
  * row, so the argmax equals the cosine argmax.
  *
  * Magnitude budget: with `scale = 2^16` and components in (−1, 1),
  * quantized components stay under 2^16, centroid components (floored
  * means) likewise, so `dot(v,m) ≤ dim · 2^32` and `dot(m,m)` the same —
  * exact in a double for any real embedding dimensionality.
  *
  * Rows with a NULL vector take a NULL `cid` and are excluded from
  * centroid updates (a null embedding cannot vote); empty clusters keep
  * their previous centroid (the standard Lloyd fallback), and an
  * all-zero centroid scores −∞ so it can never capture rows.
  */
object KMeans {

  /** Fixed-point quantization scale: 2^16 keeps every dot product exact
    * in a double for unit-ish embeddings up to thousands of dimensions.
    */
  val defaultScale: Int = 1 << 16

  /** Trained model: exact long centroids at `scale` fixed-point. */
  final case class Model(centroids: Array[Array[Long]], scale: Int) {
    require(centroids.nonEmpty, "model needs at least one centroid")
    def k: Int = centroids.length
  }

  /** `floor(x · scale + 0.5)` per component as exact longs — the
    * engine-independent quantizer (see class doc).
    */
  def quantize(vec: Column, scale: Int = defaultScale): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(scale.toDouble) + lit(0.5)).cast("long"))

  /** Assignment score of quantized vector `v` against one exact centroid:
    * `dot(v,m)/sqrt(dot(m,m))`, −∞ for a zero centroid.
    */
  private def centroidScore(v: Column, m: Array[Long]): Column = {
    var nrm = 0L
    var i = 0
    while (i < m.length) { nrm += m(i) * m(i); i += 1 }
    if (nrm == 0L) lit(Double.NegativeInfinity)
    else VectorExpressions.dotLongC(v, typedlit(m.toSeq))
      .cast("double") / lit(math.sqrt(nrm.toDouble))
  }

  /** Above this many total centroid components (k × dim) the
    * assignment rides the matrix as a codegen REFERENCE
    * ([[graft.functions.KMeansExpressions.assignBestC]]) instead of
    * per-centroid `typedlit` plan literals — the
    * [[Bloom.BloomFilter.literalWordCap]] discipline: a k=4096 ×
    * dim=768 model as literals is ~3M elements serialized with EVERY
    * plan. Below the cut the literal spelling stays (fully
    * oracle-replayable SQL, zero reference objects).
    */
  val literalComponentCap: Int = 4096

  /** `(cid, score)` of the argmax-score centroid for a quantized vector
    * (ties → lowest index; NULL vector → NULL pair). Dispatches on
    * model size: small models inline as plan literals
    * ([[assignmentColumnsLiteral]]), large ones ride a codegen
    * reference ([[assignmentColumnsRef]]) — KMeansSpec pins the two
    * bit-identical. The score is `dot/√nrm` over exact integers, so it
    * is bit-identical in any engine (the class exactness argument) —
    * which is what lets the OUTLIER operators threshold and emit it.
    */
  def assignmentColumns(vq: Column,
      centroids: Array[Array[Long]]): (Column, Column) = {
    require(centroids.nonEmpty, "at least one centroid")
    if (centroids.length.toLong * centroids(0).length >
        literalComponentCap)
      assignmentColumnsRef(vq, centroids)
    else assignmentColumnsLiteral(vq, centroids)
  }

  /** The literal-path spelling: scores as an inline array — spelled as
    * `array_position(scores, array_max(scores))` so each centroid's
    * score subtree appears ONCE (a `when`-chain fold references its
    * accumulator twice per step and balloons the expression tree 2^k,
    * which at k=5 cost ~7× in Catalyst/codegen time per job).
    * `array_position` returns the FIRST match, which IS the
    * lowest-index tie rule; with every centroid zero all scores are −∞
    * and position 1 → cid 0, the same answer the fold gave.
    */
  private[pipeline] def assignmentColumnsLiteral(vq: Column,
      centroids: Array[Array[Long]]): (Column, Column) = {
    val scores = array(centroids.map(m => centroidScore(vq, m)): _*)
    val best = array_max(scores)
    val cid = (array_position(scores, best) - lit(1L)).cast("int")
    (when(vq.isNull, lit(null)).otherwise(cid),
      when(vq.isNull, lit(null)).otherwise(best))
  }

  /** The reference-path kernel as ONE struct-valued column
    * (`struct(cid int, score double)`, NULL in → NULL struct): norms
    * precompute driver-side so per-row work is k exact dot products,
    * and a caller that needs BOTH fields stages this as a single
    * intermediate column and extracts fields from the attribute — the
    * kernel then runs once per row by construction instead of relying
    * on codegen subexpression elimination (off under interpreted
    * projection) to dedupe two embedded copies.
    */
  private[pipeline] def bestStructRef(vq: Column,
      centroids: Array[Array[Long]]): Column = {
    val nrmSqrt = centroids.map { m =>
      var n = 0L; var i = 0
      while (i < m.length) { n += m(i) * m(i); i += 1 }
      math.sqrt(n.toDouble)
    }
    graft.functions.KMeansExpressions.assignBestC(vq, centroids, nrmSqrt)
  }

  /** The reference-path spelling of [[assignmentColumns]]'s contract
    * (two independent columns — each embeds its own kernel call; use
    * [[bestStructRef]] staged as a column when both are consumed).
    */
  private[pipeline] def assignmentColumnsRef(vq: Column,
      centroids: Array[Array[Long]]): (Column, Column) = {
    val bestStruct = bestStructRef(vq, centroids)
    (when(vq.isNull, lit(null))
       .otherwise(bestStruct.getField("cid")),
      when(vq.isNull, lit(null))
        .otherwise(bestStruct.getField("score")))
  }

  /** Argmax-score cluster id for a quantized vector (ties → lowest
    * index; NULL vector → NULL).
    */
  def assignColumn(vq: Column, centroids: Array[Array[Long]]): Column =
    assignmentColumns(vq, centroids)._1

  /** Deterministic init: the `k` corpus vectors first in
    * `(md5(id), id)` order — [[Sampling.hashOrderKey]], the same
    * replayable uniform draw every sampling oracle uses.
    */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      scale: Int = defaultScale): Array[Array[Long]] = {
    require(k >= 1, "k must be >= 1")
    df.filter(col(vecCol).isNotNull)
      .select(quantize(col(vecCol), scale).as("vq"))
      .orderBy(Sampling.hashOrderKey(col(idCol)), col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0).toArray)
  }

  /** Quantize + argmax-assign one raw vector in JVM code — the SAME
    * IEEE/integer ops as the Column path ([[quantize]] /
    * [[assignmentColumns]]), loop order included, so the two are
    * bit-identical; KMeansSpec pins the parity. Returns the quantized
    * vector and the winning cluster (−1 for null input).
    */
  private[pipeline] def quantizeAssignJ(x: Array[Double],
      centroids: Array[Array[Long]], nrmSqrt: Array[Double],
      scale: Int): (Array[Long], Int) = {
    if (x == null) return (null, -1)
    val q = new Array[Long](x.length)
    var i = 0
    while (i < x.length) {
      q(i) = math.floor(x(i) * scale + 0.5).toLong
      i += 1
    }
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val m = centroids(c)
      val n = math.min(q.length, m.length)
      var dot = 0L
      var j = 0
      while (j < n) { dot += q(j) * m(j); j += 1 }
      val s = if (nrmSqrt(c) == 0.0) Double.NegativeInfinity
        else dot.toDouble / nrmSqrt(c)
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    (q, best)
  }

  /** One Lloyd round: assign against `centroids`, then replace each
    * centroid with the floored per-cluster component mean (empty
    * cluster → previous centroid). One scan through a per-partition
    * JVM kernel (quantize + argmax + accumulate — a `posexplode`
    * spelling re-evaluated the CodegenFallback assignment per exploded
    * row, 64× the work); each partition emits at most `k × dim`
    * partial-sum rows, a tiny keyed aggregation finishes them, and the
    * driver holds only the `k × dim` matrix.
    */
  def lloydRound(df: DataFrame, vecCol: String,
      centroids: Array[Array[Long]],
      scale: Int = defaultScale): Array[Array[Long]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val k = centroids.length
    val dim = centroids(0).length
    val nrmSqrt = centroids.map { m =>
      var n = 0L; var i = 0
      while (i < m.length) { n += m(i) * m(i); i += 1 }
      math.sqrt(n.toDouble)
    }
    val bc = spark.sparkContext.broadcast((centroids, nrmSqrt))
    // partials: (c, dim, count) carries the cluster count on pos=dim
    // array<double>, NOT array<float>: [[quantize]] and the assign
    // paths all quantize full-precision doubles, so a double-typed
    // embedding column must train on the same values it will be
    // assigned with (a float round-trip here would break the
    // bit-identity contract for double inputs; floats widen exactly)
    val partials = df
      .filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>"))
      .as[Array[Double]]
      .mapPartitions { rows =>
        val (cents, nrms) = bc.value
        val acc = Array.fill(cents.length)(new Array[Long](dim))
        val cnt = new Array[Long](cents.length)
        rows.foreach { x =>
          val (q, c) = quantizeAssignJ(x, cents, nrms, scale)
          if (c >= 0) {
            cnt(c) += 1
            var i = 0
            val n = math.min(dim, q.length)
            while (i < n) { acc(c)(i) += q(i); i += 1 }
          }
        }
        (0 until cents.length).iterator.flatMap { c =>
          if (cnt(c) == 0L) Iterator.empty
          else (0 until dim).iterator.map(p => (c, p, acc(c)(p))) ++
            Iterator.single((c, dim, cnt(c)))
        }
      }
      .groupBy("_1", "_2").agg(sum("_3").as("s"))
      .collect()
    val acc = Array.fill(k)(new Array[Long](dim))
    val cnt = new Array[Long](k)
    partials.foreach { r =>
      val c = r.getInt(0); val p = r.getInt(1)
      if (p == dim) cnt(c) = r.getLong(2) else acc(c)(p) = r.getLong(2)
    }
    centroids.zipWithIndex.map { case (old, c) =>
      if (cnt(c) == 0L) old
      else acc(c).map(s => math.floor(s.toDouble / cnt(c)).toLong)
    }
  }

  /** Train `k` clusters with `iters` full-corpus Lloyd rounds. */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, scale: Int = defaultScale): Model = {
    require(iters >= 0, "iters must be >= 0")
    var centroids = initCentroids(df, idCol, vecCol, k, scale)
    for (_ <- 1 to iters)
      centroids = lloydRound(df, vecCol, centroids, scale)
    Model(centroids, scale)
  }

  /** `df` plus an integer `cid` column (NULL for NULL vectors) —
    * map-only, centroids ride the plan.
    */
  def assign(df: DataFrame, vecCol: String, model: Model,
      cidCol: String = "cid"): DataFrame =
    df.withColumn(cidCol,
      assignColumn(quantize(col(vecCol), model.scale), model.centroids))

  /** [[assign]] plus the winning centroid's COSINE (`scoreCol`,
    * double) — the distance-to-corpus-structure signal: a document
    * whose best cosine is still low sits far from every topical mass.
    * Computed as `(dot/√nrm_m)/√nrm_v` — exact integers through two
    * correctly-rounded IEEE steps, so the value is bit-identical in any
    * engine and SAFE to threshold or quantize in an oracle. A zero
    * vector has no direction: its score is NULL (cid still folds to
    * the lowest index, as [[assignColumn]] defines).
    */
  def assignWithScore(df: DataFrame, vecCol: String, model: Model,
      cidCol: String = "cid", scoreCol: String = "score"): DataFrame = {
    val vq = quantize(col(vecCol), model.scale)
    // Both output columns consume the same argmax computation. Past the
    // literal cap, stage the kernel's struct as ONE intermediate column
    // and extract fields from the attribute — the k×dim kernel then
    // runs once per row by construction, not by hoping codegen
    // subexpression elimination dedupes two embedded copies (CSE is off
    // under interpreted projection). The staged Project survives
    // CollapseProject because the non-cheap producer is referenced more
    // than once. Below the cap the literal spelling stays inline (its
    // score array is plan literals; duplication there is bounded by
    // [[literalComponentCap]]).
    // collision-free staging name: an input that already carries
    // `_graft_best` must not be silently overwritten and dropped
    val best = Iterator.iterate("_graft_best")(_ + "_")
      .dropWhile(df.columns.contains).next()
    val large = model.centroids.length.toLong *
      model.centroids(0).length > literalComponentCap
    val staged =
      if (large) df.withColumn(best, bestStructRef(vq, model.centroids))
      else {
        val (cid, raw) = assignmentColumnsLiteral(vq, model.centroids)
        df.withColumn(best,
          when(vq.isNull, lit(null))
            .otherwise(struct(cid.as("cid"), raw.as("score"))))
      }
    val nv = graft.functions.VectorExpressions.dotLongC(vq, vq)
      .cast("double")
    val cosine = when(nv === lit(0.0), lit(null).cast("double"))
      .otherwise(col(s"$best.score") / sqrt(nv))
    staged.withColumn(cidCol, col(s"$best.cid"))
      .withColumn(scoreCol, cosine)
      .drop(best)
  }

  /** Cluster-outlier rows: documents whose best centroid score falls
    * BELOW `minScore` — the embedding-space quality gate (off-topic,
    * garbled, or adversarial content sits far from every cluster).
    * Map-only; NULL vectors are not outliers (they carry no position —
    * route them through a null-rate check instead).
    */
  def outliers(df: DataFrame, vecCol: String, model: Model,
      minScore: Double, cidCol: String = "cid",
      scoreCol: String = "score"): DataFrame =
    assignWithScore(df, vecCol, model, cidCol, scoreCol)
      .filter(col(scoreCol) < minScore)

  /** Per-cluster population and mean vector norm proxy — the mixture
    * dashboard aggregate: `(cid, size)`.
    */
  def clusterSizes(assigned: DataFrame, cidCol: String = "cid"): DataFrame =
    assigned.groupBy(col(cidCol)).agg(count(lit(1)).as("size"))

  /** Assignment against a centroid FRAME (the `(c, p, m)` sidecar rows)
    * instead of a driver-held model — the fully-declarative variant the
    * SQL table function requires (no collect at plan-construction
    * time). The centroids pack into ONE broadcast row of
    * `array<struct<c,m>>` and the argmax folds inside each row via
    * `aggregate`, so the plan is a broadcast join plus a map — nothing
    * corpus-sized shuffles. Scores, tie rule, and the NULL/zero-centroid
    * semantics are the same expressions as [[assignColumn]], so the two
    * paths agree bit-for-bit.
    */
  def assignAgainstSidecar(df: DataFrame, vecCol: String,
      centroids: DataFrame, scale: Int = defaultScale,
      cidCol: String = "cid"): DataFrame = {
    val perC = centroids.groupBy(col("c"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        s => s.getField("m")).as("m"))
    val packed = perC
      .agg(array_sort(collect_list(struct(col("c"), col("m"))))
        .as("_cents"))
    val vq = quantize(col(vecCol), scale)
    val best = aggregate(
      col("_cents"),
      struct(lit(-1).as("c"), lit(Double.NegativeInfinity).as("s")),
      (acc, x) => {
        val m = x.getField("m")
        val nrm = VectorExpressions.dotLongC(m, m).cast("double")
        val sc = when(nrm === lit(0.0), lit(Double.NegativeInfinity))
          .otherwise(VectorExpressions.dotLongC(vq, m).cast("double") /
            sqrt(nrm))
        when(sc > acc.getField("s"),
          struct(x.getField("c").as("c"), sc.as("s"))).otherwise(acc)
      },
      // all-−∞ (every centroid zero): assignColumn keeps its initial
      // c=0, the fold keeps its seed c=−1 — clamp for exact parity
      acc => greatest(acc.getField("c"), lit(0)))
    df.crossJoin(broadcast(packed))
      .withColumn(cidCol, when(vq.isNull, lit(null)).otherwise(best))
      .drop("_cents")
  }

  /** Persist a trained model as a sidecar: `path/centroids` holds
    * `(c, p, m)` rows (exact longs), `path/params` the scale — KBs, the
    * [[Similarity.writeIvfIndex]] discipline, so day-2 assignment and
    * the streaming probe never retrain.
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.flatMap { case (v, c) =>
      v.zipWithIndex.map { case (x, p) => (c, p, x) }
    }.toSeq.toDF("c", "p", "m")
      .coalesce(1).write.mode("overwrite").parquet(path + "/centroids")
    Seq(model.scale).toDF("scale")
      .coalesce(1).write.mode("overwrite").parquet(path + "/params")
  }

  /** Reload a persisted model (driver-side collect of the KB-sized
    * centroid matrix — it rides query plans as literals).
    */
  def readModel(spark: org.apache.spark.sql.SparkSession, path: String)
      : Model = {
    val rows = spark.read.parquet(path + "/centroids")
      .select("c", "p", "m").collect()
    require(rows.nonEmpty, s"empty centroid sidecar at $path")
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val cents = Array.fill(k)(new Array[Long](dim))
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val scale = spark.read.parquet(path + "/params")
      .collect()(0).getInt(0)
    Model(cents, scale)
  }

  /** Cluster-diverse sample: the first `perCluster` rows of each cluster
    * in `(md5(id), id)` order — a topically balanced draw for training
    * prep (each topic contributes equally regardless of its population).
    *
    * Skew posture: a raw `Window.partitionBy(cid)` would sort each
    * cluster in ONE reducer (k is small, clusters are corpus-sized), so
    * the cap delegates to [[Sampling.capPerKey]] — the exact two-phase
    * salted top-k. The order column is the composite
    * `md5(id) ++ zero-padded id` string: same total order as
    * `(md5(id), id)` and unique per row, which `capPerKey` requires.
    */
  def diverseSample(assigned: DataFrame, idCol: String, perCluster: Int,
      cidCol: String = "cid"): DataFrame = {
    require(perCluster >= 1, "perCluster must be >= 1")
    val ord = concat(Sampling.hashOrderKey(col(idCol)),
      lpad(col(idCol).cast("string"), 20, "0"))
    Sampling.capPerKey(
      assigned.filter(col(cidCol).isNotNull).withColumn("_dord", ord),
      cidCol, "_dord", perCluster)
      .drop("_dord")
  }
}
