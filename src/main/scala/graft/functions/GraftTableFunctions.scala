package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim

import graft.pipeline.Curation

/** The engine's PIPELINE operators as SQL table-valued functions, so a
  * pure-`spark.sql` user reaches the composed operators — not just the
  * scalar surface ([[GraftFunctions]]). Registered either in-place on
  * an existing session ([[register]]) or at session build time via
  * [[graft.GraftExtensions]].
  *
  * Each builder constructs the SAME DataFrame operator the Column API
  * runs (no parallel SQL reimplementation to drift) and splices its
  * logical plan in place of the `FROM graft_curate(...)` reference —
  * Catalyst then optimizes the whole statement as one plan, exactly as
  * if the operator had been composed through the DataFrame API:
  *
  * {{{
  * docs.createOrReplaceTempView("docs")
  * spark.sql("""SELECT * FROM graft_curate('docs', 'doc_id', 'text')
  *              WHERE status = 'kept'""")
  * }}}
  *
  * Only declarative operators are exposed this way: a table function's
  * plan is built during ANALYSIS, so iterative operators that run jobs
  * while constructing their result (transitive clustering, persisted
  * index builds) stay DataFrame-API-only by design.
  */
object GraftTableFunctions {

  private def strLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Number, _) =>
      n.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def numLit(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Number, _) =>
      n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** `graft_curate(view, idCol, textCol[, keepLang, minQuality,
    * threshold, strategy])` — the end-to-end curation audit
    * ([[Curation.curate]]: language → quality → exact dedup → near-dup
    * → split) as a FROM-clause table function returning
    * `(idCol, status, split)`. `strategy` ∈ 'minhash' (default — the
    * at-scale candidate generation), 'ngram' (exact-Jaccard blocking
    * with the stop-shingle guard), 'ngram_exact' (guard off — what the
    * DuckDB oracle replays).
    */
  private def curateBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 3 && es.length <= 7,
      "usage: graft_curate(view, idCol, textCol[, keepLang, minQuality," +
        " threshold, strategy])")
    val view = strLit(es(0), "view name")
    val idCol = strLit(es(1), "id column")
    val textCol = strLit(es(2), "text column")
    val lang = if (es.length > 3) strLit(es(3), "keepLang") else "en"
    val minQ = if (es.length > 4) intLit(es(4), "minQuality") else 40
    val thr = if (es.length > 5) numLit(es(5), "threshold") else 0.8
    val nearDup = (if (es.length > 6) strLit(es(6), "strategy")
      else "minhash") match {
      case "minhash" => Curation.NearDupStrategy.MinHash()
      case "ngram" => Curation.NearDupStrategy.Ngram()
      case "ngram_exact" => Curation.NearDupStrategy.Ngram(maxDocFreq = 0)
      case other => throw new IllegalArgumentException(
        s"strategy must be minhash | ngram | ngram_exact, got '$other'")
    }
    val spark = SparkSession.active
    graftshim.logicalPlan(Curation.curate(spark.table(view), idCol,
      textCol, Curation.Config(keepLangs = Seq(lang), minQuality = minQ,
        nearDupThreshold = thr, nearDup = nearDup)))
  }

  /** `graft_dedup_exact(view, idCol, textCol)` — exact duplicate
    * groups by content hash ([[graft.pipeline.Dedup.exactGroups]]):
    * one row per duplicated content as
    * `(content_hash, keep_id, n_copies)`.
    */
  private def dedupExactBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 3,
      "usage: graft_dedup_exact(view, idCol, textCol)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Dedup.exactGroups(
      spark.table(strLit(es(0), "view name")),
      strLit(es(1), "id column"), strLit(es(2), "text column")))
  }

  /** `graft_contamination(corpusView, benchView, idCol, textCol,
    * benchTextCol[, shingleSize])` — the benchmark-decontamination
    * report ([[Curation.contamination]]): per overlapping corpus doc,
    * its shingle count and distinct shingles shared with ANY benchmark
    * text. The benchmark side broadcasts; the corpus is scanned once.
    */
  private def contaminationBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5 || es.length == 6,
      "usage: graft_contamination(corpusView, benchView, idCol, " +
        "textCol, benchTextCol[, shingleSize])")
    val spark = SparkSession.active
    graftshim.logicalPlan(Curation.contamination(
      spark.table(strLit(es(0), "corpus view")),
      spark.table(strLit(es(1), "benchmark view")),
      strLit(es(2), "id column"), strLit(es(3), "text column"),
      strLit(es(4), "benchmark text column"),
      if (es.length > 5) intLit(es(5), "shingle size") else 3))
  }

  /** `graft_line_dedup(view, idCol, textCol, maxDocFreq)` — line-level
    * boilerplate removal ([[graft.pipeline.LineDedup.dropBoilerplate]]):
    * per input document, the text with corpus-frequent lines stripped
    * plus its line accounting, as `(idCol, text, n_lines, n_dropped)`.
    */
  private def lineDedupBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_line_dedup(view, idCol, textCol, maxDocFreq)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.LineDedup.dropBoilerplate(
      spark.table(strLit(es(0), "view name")),
      strLit(es(1), "id column"), strLit(es(2), "text column"),
      intLit(es(3), "maxDocFreq")))
  }

  /** `graft_span_dedup(view, idCol, textCol, windowTokens)` — exact
    * duplicated-span detection
    * ([[graft.pipeline.SpanDedup.duplicateSpans]]): one row per merged
    * duplicated token span as `(id, span_start, span_end)`, keep-first
    * by corpus (doc, start) order.
    */
  private def spanDedupBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_span_dedup(view, idCol, textCol, windowTokens)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.SpanDedup.duplicateSpans(
      spark.table(strLit(es(0), "view name")),
      strLit(es(1), "id column"), strLit(es(2), "text column"),
      intLit(es(3), "windowTokens")))
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(n: Number, _) =>
      n.longValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** `graft_sessionize(view, keyCol, tsCol, gapMicros)` — gap-based
    * session labels ([[graft.pipeline.Temporal.sessionize]]): every
    * input row plus its 1-based `session_seq` within the key.
    */
  private def sessionizeBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_sessionize(view, keyCol, tsCol, gapMicros)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Temporal.sessionize(
      spark.table(strLit(es(0), "view name")),
      Seq(strLit(es(1), "key column")), strLit(es(2), "ts column"),
      longLit(es(3), "gapMicros")))
  }

  /** `graft_session_stats(view, keyCol, tsCol, gapMicros)` — per-
    * session aggregates ([[graft.pipeline.Temporal.sessionStats]]) as
    * `(keyCol, session_seq, session_start, session_end, n_events)`.
    */
  private def sessionStatsBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_session_stats(view, keyCol, tsCol, gapMicros)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Temporal.sessionStats(
      spark.table(strLit(es(0), "view name")),
      Seq(strLit(es(1), "key column")), strLit(es(2), "ts column"),
      longLit(es(3), "gapMicros")))
  }

  /** `graft_asof_join(leftView, rightView, keyCol, leftTs, rightTs[,
    * direction])` — the as-of join
    * ([[graft.pipeline.Temporal.asofJoin]]): every left row with the
    * latest at-or-before (backward, default), earliest at-or-after
    * (forward), or closest (nearest) right row per key.
    */
  private def asofJoinBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5 || es.length == 6,
      "usage: graft_asof_join(leftView, rightView, keyCol, leftTs, " +
        "rightTs[, direction])")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Temporal.asofJoin(
      spark.table(strLit(es(0), "left view")),
      spark.table(strLit(es(1), "right view")),
      Seq(strLit(es(2), "key column")), strLit(es(3), "left ts column"),
      strLit(es(4), "right ts column"),
      if (es.length > 5) strLit(es(5), "direction") else "backward"))
  }

  /** `graft_band_join(leftView, rightView, keyCol, leftTs, rightTs,
    * bandMicros)` — pairs within a time band
    * ([[graft.pipeline.Temporal.bandJoin]]). The interval form
    * (`pointInIntervalJoin`) stays DataFrame-API-only: it measures the
    * widest interval (a job) while building its plan, which a table
    * function must not do during analysis.
    */
  private def bandJoinBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 6,
      "usage: graft_band_join(leftView, rightView, keyCol, leftTs, " +
        "rightTs, bandMicros)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Temporal.bandJoin(
      spark.table(strLit(es(0), "left view")),
      spark.table(strLit(es(1), "right view")),
      Seq(strLit(es(2), "key column")), strLit(es(3), "left ts column"),
      strLit(es(4), "right ts column"), longLit(es(5), "bandMicros")))
  }

  /** `graft_lm_score(view, idCol, textCol[, vocabSize])` — bigram-LM
    * quality scores self-trained on the view
    * ([[graft.pipeline.LanguageModel]]), as
    * `(doc_id, n_bigrams, lm_score)`. Training is itself declarative
    * (two aggregations), so the whole train+score composition splices
    * as one plan.
    */
  private def lmScoreBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 3 || es.length == 4,
      "usage: graft_lm_score(view, idCol, textCol[, vocabSize])")
    val spark = SparkSession.active
    val df = spark.table(strLit(es(0), "view name"))
    val idCol = strLit(es(1), "id column")
    val textCol = strLit(es(2), "text column")
    val vocab = if (es.length > 3) intLit(es(3), "vocabSize") else 10000
    val m = graft.pipeline.LanguageModel.train(df, idCol, textCol, vocab)
    graftshim.logicalPlan(
      graft.pipeline.LanguageModel.score(df, idCol, textCol, m))
  }

  /** `graft_containment(view, idCol, textCol[, threshold, maxDocFreq])`
    * — asymmetric partial-copy detection
    * ([[graft.pipeline.Dedup.containmentPairs]]): unordered pairs whose
    * larger containment direction reaches `threshold`, as
    * `(id_a, id_b, containment_a, containment_b)`.
    */
  private def containmentBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length >= 3 && es.length <= 5,
      "usage: graft_containment(view, idCol, textCol[, threshold, " +
        "maxDocFreq])")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Dedup.containmentPairs(
      spark.table(strLit(es(0), "view name")),
      strLit(es(1), "id column"), strLit(es(2), "text column"),
      if (es.length > 3) numLit(es(3), "threshold") else 0.9,
      maxDocFreq =
        if (es.length > 4) intLit(es(4), "maxDocFreq") else 1000))
  }

  /** `graft_bm25_search(corpusView, queriesView, corpusId, corpusText,
    * queryId, queryText, k)` — BM25 top-k retrieval
    * ([[graft.pipeline.Search.searchCorpus]], the fully-declarative
    * one-plan variant: collection stats ride in as a broadcast one-row
    * cross join, so plan construction runs no job), as
    * `(query_id, rank, doc_id, score_q)`.
    */
  private def bm25SearchBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 7,
      "usage: graft_bm25_search(corpusView, queriesView, corpusId, " +
        "corpusText, queryId, queryText, k)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Search.searchCorpus(
      spark.table(strLit(es(0), "corpus view")),
      strLit(es(2), "corpus id column"),
      strLit(es(3), "corpus text column"),
      spark.table(strLit(es(1), "queries view")),
      strLit(es(4), "query id column"),
      strLit(es(5), "query text column"),
      intLit(es(6), "k")))
  }

  /** `graft_hard_negatives(corpusView, queriesView, corpusId,
    * corpusText, queryId, queryText, k)` — DPR-style hard-negative
    * mining ([[graft.pipeline.Search.hardNegatives]]: top-k BM25
    * documents that are not the query's own), as
    * `(query_id, neg_rank, doc_id, score_q)`.
    */
  private def hardNegativesBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 7,
      "usage: graft_hard_negatives(corpusView, queriesView, corpusId, " +
        "corpusText, queryId, queryText, k)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Search.hardNegatives(
      spark.table(strLit(es(0), "corpus view")),
      strLit(es(2), "corpus id column"),
      strLit(es(3), "corpus text column"),
      spark.table(strLit(es(1), "queries view")),
      strLit(es(4), "query id column"),
      strLit(es(5), "query text column"),
      intLit(es(6), "k")))
  }

  /** `graft_hybrid_search(corpusView, vecView, queriesView, corpusId,
    * corpusText, vecId, vecCol, queryId, queryText, queryVec, kEach,
    * topK)` — hybrid lexical+vector retrieval fused by exact integral
    * RRF ([[graft.pipeline.Hybrid.rrfFuse]]), as
    * `(query_id, id, rrf_q, rank)`. Both legs are the fully-declarative
    * one-plan variants ([[graft.pipeline.Search.searchCorpus]] with
    * broadcast one-row stats; [[graft.pipeline.Similarity
    * .cosineTopKDeclarative]] with a broadcast query batch), so plan
    * construction runs no job — the TVF contract.
    */
  private def hybridSearchBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 12,
      "usage: graft_hybrid_search(corpusView, vecView, queriesView, " +
        "corpusId, corpusText, vecId, vecCol, queryId, queryText, " +
        "queryVec, kEach, topK)")
    val spark = SparkSession.active
    val queries = spark.table(strLit(es(2), "queries view"))
    val kEach = intLit(es(10), "kEach")
    val bm = graft.pipeline.Search.searchCorpus(
        spark.table(strLit(es(0), "corpus view")),
        strLit(es(3), "corpus id column"),
        strLit(es(4), "corpus text column"),
        queries, strLit(es(7), "query id column"),
        strLit(es(8), "query text column"), kEach)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val ann = graft.pipeline.Similarity.cosineTopKDeclarative(
        spark.table(strLit(es(1), "vector view")),
        strLit(es(5), "vector id column"),
        strLit(es(6), "vector column"),
        queries, strLit(es(7), "query id column"),
        strLit(es(9), "query vector column"), kEach)
      .select(col("query_id"), col("id"), col("rank"))
    graftshim.logicalPlan(graft.pipeline.Hybrid.rrfFuse(
      Seq(bm, ann), "query_id", "id", "rank",
      k0 = 60, topK = intLit(es(11), "topK")))
  }

  /** `graft_chunk(view, idCol, textCol, size, overlap)` — token-window
    * chunking ([[graft.pipeline.Chunking.chunkDocuments]]) as
    * `(doc_id, chunk_id, start_tok, n_tok, chunk)` rows.
    */
  private def chunkBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5,
      "usage: graft_chunk(view, idCol, textCol, size, overlap)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Chunking.chunkDocuments(
      spark.table(strLit(es(0), "view")),
      strLit(es(1), "id column"), strLit(es(2), "text column"),
      intLit(es(3), "size"), intLit(es(4), "overlap")))
  }

  /** `graft_chunk_sentences(view, idCol, textCol, size, overlap)` —
    * sentence-boundary chunking
    * ([[graft.pipeline.Chunking.chunkBySentences]]) as
    * `(doc_id, chunk_id, start_sent, n_sent, chunk)` rows.
    */
  private def chunkSentencesBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5,
      "usage: graft_chunk_sentences(view, idCol, textCol, size, overlap)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Chunking.chunkBySentences(
      spark.table(strLit(es(0), "view")),
      strLit(es(1), "id column"), strLit(es(2), "text column"),
      intLit(es(3), "size"), intLit(es(4), "overlap")))
  }

  /** `graft_kmeans_assign(view, vecCol, sidecarPath, scale)` — cluster
    * id per row against a persisted k-means centroid sidecar
    * ([[graft.pipeline.KMeans.writeModel]]), as the input columns plus
    * `cid`. Uses the fully-declarative sidecar-join assignment
    * ([[graft.pipeline.KMeans.assignAgainstSidecar]]: centroids pack
    * into one broadcast row, the argmax folds per row) so plan
    * construction runs no job — the TVF contract.
    */
  private def kmeansAssignBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_kmeans_assign(view, vecCol, sidecarPath, scale)")
    val spark = SparkSession.active
    val cents = spark.read
      .parquet(strLit(es(2), "sidecar path") + "/centroids")
    graftshim.logicalPlan(graft.pipeline.KMeans.assignAgainstSidecar(
      spark.table(strLit(es(0), "view")), strLit(es(1), "vector column"),
      cents, intLit(es(3), "scale")))
  }

  /** `graft_drift_num(refView, curView, colName, bins, lo, hi)` —
    * numeric distribution drift between two snapshots over the
    * explicit window `[lo, hi]` ([[graft.pipeline.Drift
    * .reportWithBounds]]), one row
    * `(column, ref_rows, cur_rows, tvd_num, tvd_den, tvd, psi, jsd)`.
    * The window is a literal (a data-derived window would need a scan
    * at plan time); compute it upstream or use a business constant.
    */
  private def driftNumBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 6,
      "usage: graft_drift_num(refView, curView, colName, bins, lo, hi)")
    val spark = SparkSession.active
    val name = strLit(es(2), "column name")
    graftshim.logicalPlan(graft.pipeline.Drift.reportWithBounds(
      spark.table(strLit(es(0), "reference view")),
      spark.table(strLit(es(1), "current view")),
      Seq(graft.pipeline.Drift.numeric(name, col(name),
        intLit(es(3), "bins"))),
      Map(name -> (longLit(es(4), "lo"), longLit(es(5), "hi")))))
  }

  /** `graft_drift_cat(refView, curView, colName)` — categorical
    * distribution drift between two snapshots (same row shape as
    * [[driftNumBuilder]]).
    */
  private def driftCatBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 3,
      "usage: graft_drift_cat(refView, curView, colName)")
    val spark = SparkSession.active
    val name = strLit(es(2), "column name")
    graftshim.logicalPlan(graft.pipeline.Drift.reportWithBounds(
      spark.table(strLit(es(0), "reference view")),
      spark.table(strLit(es(1), "current view")),
      Seq(graft.pipeline.Drift.categorical(name, col(name))), Map.empty))
  }

  /** `graft_weighted_sample(view, keyCol, weightCol, n, seed)` —
    * deterministic Efraimidis–Spirakis weighted sample
    * ([[graft.pipeline.Sampling.weightedSample]]): inclusion ∝ weight,
    * one top-n heap, fully declarative.
    */
  private def weightedSampleBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 5,
      "usage: graft_weighted_sample(view, keyCol, weightCol, n, seed)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Sampling.weightedSample(
      spark.table(strLit(es(0), "view")), strLit(es(1), "key column"),
      col(strLit(es(2), "weight column")), intLit(es(3), "n"),
      strLit(es(4), "seed")))
  }

  /** `graft_corpus_diff(oldView, curView, idCol, contentCol)` —
    * row-level snapshot diff ([[graft.pipeline.Drift.corpusDiff]]) as
    * `(id, status)` with status ∈ added/removed/changed/unchanged.
    */
  private def corpusDiffBuilder(es: Seq[Expression]): LogicalPlan = {
    require(es.length == 4,
      "usage: graft_corpus_diff(oldView, curView, idCol, contentCol)")
    val spark = SparkSession.active
    graftshim.logicalPlan(graft.pipeline.Drift.corpusDiff(
      spark.table(strLit(es(0), "old view")),
      spark.table(strLit(es(1), "current view")),
      strLit(es(2), "id column"), strLit(es(3), "content column")))
  }

  /** (name, builder) for every registered table function. */
  val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_weighted_sample" -> (weightedSampleBuilder _),
    "graft_corpus_diff" -> (corpusDiffBuilder _),
    "graft_kmeans_assign" -> (kmeansAssignBuilder _),
    "graft_drift_num" -> (driftNumBuilder _),
    "graft_drift_cat" -> (driftCatBuilder _),
    "graft_bm25_search" -> (bm25SearchBuilder _),
    "graft_hybrid_search" -> (hybridSearchBuilder _),
    "graft_hard_negatives" -> (hardNegativesBuilder _),
    "graft_chunk" -> (chunkBuilder _),
    "graft_chunk_sentences" -> (chunkSentencesBuilder _),
    "graft_curate" -> (curateBuilder _),
    "graft_dedup_exact" -> (dedupExactBuilder _),
    "graft_contamination" -> (contaminationBuilder _),
    "graft_line_dedup" -> (lineDedupBuilder _),
    "graft_span_dedup" -> (spanDedupBuilder _),
    "graft_sessionize" -> (sessionizeBuilder _),
    "graft_session_stats" -> (sessionStatsBuilder _),
    "graft_asof_join" -> (asofJoinBuilder _),
    "graft_band_join" -> (bandJoinBuilder _),
    "graft_lm_score" -> (lmScoreBuilder _),
    "graft_containment" -> (containmentBuilder _))

  /** Register every table function on an existing session. Idempotent. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      graftshim.registerTableFunction(spark, name, builder)
    }

  /** Inject every table function into a `SparkSessionExtensions` (the
    * `spark.sql.extensions` path — see [[graft.GraftExtensions]]).
    */
  def injectInto(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftTableFunctions", name),
        builder))
    }
}
