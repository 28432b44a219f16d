package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField,
  StructType}

/** Token-budget sharding — pack documents into contiguous training
  * shards of ~`budget` tokens each, in a deterministic global order.
  *
  * Contract: rows are ordered by `idCol` (globally); each row's shard is
  * `floor(exclusiveRunningTokenSum / budget)` (long integer division).
  * The assignment is a pure function of the (id → tokens) mapping, so
  * it is reproducible across runs, partitionings, and engines — the
  * oracle recomputes it with a SQL window cumsum.
  *
  * Scale design (100 TB): a global running sum is NOT computed with a
  * single-partition window (the classic scale-killer — one task sees
  * every row). Instead the classic two-level prefix sum:
  *
  *   1. `repartitionByRange(idCol)` + `sortWithinPartitions` gives
  *      range-ordered partitions (ONE full shuffle, the unavoidable one
  *      — any global order costs exactly this);
  *   2. a first pass reduces each partition to its token SUM
  *      (numPartitions longs to the driver — bytes, not rows);
  *   3. the driver prefix-sums those into per-partition start offsets
  *      (broadcast back);
  *   4. a second pass streams each partition once, adding the local
  *      running sum to its partition offset — embarrassingly parallel,
  *      O(rows/partition) memory O(1).
  *
  * Both passes run over the SAME shuffled RDD, so Spark reuses the
  * range-exchange shuffle files for pass 2 (map stage skipped — the
  * assignment job submits only its result stage, asserted in
  * ShardingSpec with a stage-submission listener).
  * The per-partition imperative loop is the documented legitimate
  * `mapPartitions` case: a stateful running sum that no windowless
  * Column expression can express without re-shuffling by partition id.
  */
object Sharding {

  /** The shared two-level prefix-sum core: `df` + `_tokens` (the
    * evaluated token count) + `_cum` (the EXCLUSIVE global running
    * total of `_tokens` in `idCol` order), range-partitioned and
    * ordered by `idCol`. Everything downstream ([[shardByTokenBudget]],
    * [[packSequences]]) is arithmetic on `_cum`. `idCol` values must be
    * unique — the global order, and therefore the prefix, is only
    * well-defined if they are. All longs: a 100 TB corpus's running
    * token total (~25T) exceeds Int but sits far under 2⁶³.
    */
  def withRunningTotal(df: DataFrame, idCol: String, tokens: Column,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt

    val withTok = df.withColumn("_tokens",
      coalesce(tokens.cast(LongType), lit(0L)))
    val tokIdx = withTok.schema.fieldIndex("_tokens")
    val ranged = withTok.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))

    // capture ONE RDD object: both jobs below depend on the same range
    // exchange, so pass 2 reuses pass 1's shuffle files
    val rangedRdd = ranged.rdd
    val partSums = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      while (it.hasNext) s += it.next().getLong(tokIdx)
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per pid
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val out = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { r =>
        val cum = run
        run += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark.createDataFrame(out,
      StructType(ranged.schema.fields :+
        StructField("_cum", LongType, nullable = false)))
  }

  /** `df` (all columns preserved) + `_tokens` + `shard` (long — an Int
    * wraps negative at ~6e9 shards, e.g. 25T tokens / a 4096 budget),
    * ordered by `idCol` within range-ordered partitions.
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"shard budget must be positive, got $budget")
    withRunningTotal(df, idCol, tokens, numPartitions)
      .withColumn("shard", expr(s"_cum div ${budget}L"))
      .drop("_cum")
  }

  /** Document convenience: shards a `documents`-shaped frame by the
    * BPE-ish token estimate of `textCol`.
    */
  def shardDocumentsByTokenBudget(docs: DataFrame, idCol: String,
      textCol: String, budget: Long, numPartitions: Int = 0): DataFrame =
    shardByTokenBudget(docs, idCol,
      TextAnalysis.tokenEstimate(col(textCol)), budget, numPartitions)

  /** GPT-style SEQUENCE PACKING: conceptually concatenate all documents
    * in `idCol` order and chunk the token stream into fixed `maxLen`
    * training sequences (the concat-and-chunk scheme — zero padding
    * waste, documents may straddle sequence boundaries). Each document
    * gets `seq` (the sequence its first token lands in), `seq_offset`
    * (position of that token within the sequence) and `n_seqs` (how
    * many sequences it spans — 1 unless it crosses a boundary; 1 for
    * zero-token docs by convention).
    *
    * Pure arithmetic on the [[withRunningTotal]] prefix, so the whole
    * step costs the one range exchange and holds at any scale; all
    * outputs are longs (a 25T-token corpus has ~50G sequences at 512).
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      maxLen: Long, numPartitions: Int = 0): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    withRunningTotal(df, idCol, tokens, numPartitions)
      .withColumn("seq", expr(s"_cum div ${maxLen}L"))
      .withColumn("seq_offset", expr(s"_cum % ${maxLen}L"))
      .withColumn("n_seqs", expr(
        s"greatest(1L, ((_cum + _tokens + ${maxLen - 1}L) div " +
          s"${maxLen}L) - (_cum div ${maxLen}L))"))
      .drop("_cum")
  }

  /** Document convenience: packs a `documents`-shaped frame by the
    * BPE-ish token estimate of `textCol`.
    */
  def packDocumentSequences(docs: DataFrame, idCol: String,
      textCol: String, maxLen: Long, numPartitions: Int = 0): DataFrame =
    packSequences(docs, idCol,
      TextAnalysis.tokenEstimate(col(textCol)), maxLen, numPartitions)

  /** [[shardByTokenBudget]] counting REAL tokens under a BPE model —
    * shard budgets then mean exactly what the training job's tokenizer
    * will see. The encode is a map-only codegen'd kernel call folded
    * into the prefix-sum's first pass; nothing else changes.
    */
  def shardDocumentsByBpeBudget(docs: DataFrame, idCol: String,
      textCol: String, model: BpeModel, budget: Long,
      numPartitions: Int = 0): DataFrame =
    shardByTokenBudget(docs, idCol,
      graft.functions.BpeExpressions.bpeCountC(
        coalesce(col(textCol), lit("")), model),
      budget, numPartitions)

  /** [[packSequences]] counting REAL tokens under a BPE model. */
  def packDocumentSequencesBpe(docs: DataFrame, idCol: String,
      textCol: String, model: BpeModel, maxLen: Long,
      numPartitions: Int = 0): DataFrame =
    packSequences(docs, idCol,
      graft.functions.BpeExpressions.bpeCountC(
        coalesce(col(textCol), lit("")), model),
      maxLen, numPartitions)

  /** [[shardByTokenBudget]] counting REAL tokens under a unigram-LM
    * model — the [[shardDocumentsByBpeBudget]] sibling for
    * SentencePiece-family tokenizers; same map-only codegen'd kernel
    * folded into the prefix-sum's first pass.
    */
  def shardDocumentsByUnigramBudget(docs: DataFrame, idCol: String,
      textCol: String, model: UnigramModel, budget: Long,
      numPartitions: Int = 0): DataFrame =
    shardByTokenBudget(docs, idCol,
      graft.functions.UnigramExpressions.unigramCountC(
        coalesce(col(textCol), lit("")), model),
      budget, numPartitions)

  /** [[packSequences]] counting REAL tokens under a unigram-LM model. */
  def packDocumentSequencesUnigram(docs: DataFrame, idCol: String,
      textCol: String, model: UnigramModel, maxLen: Long,
      numPartitions: Int = 0): DataFrame =
    packSequences(docs, idCol,
      graft.functions.UnigramExpressions.unigramCountC(
        coalesce(col(textCol), lit("")), model),
      maxLen, numPartitions)

  /** Per-shard packing summary (shard, n_docs, shard_tokens) — the
    * manifest a training job reads; cheap aggregate over the assignment.
    */
  def shardManifest(sharded: DataFrame): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_tokens")).as("shard_tokens"))
      .orderBy("shard")

  /** Materialize a [[shardByTokenBudget]] assignment as one parquet
    * directory per shard (`shard=N/`), plus `_manifest` (the
    * [[shardManifest]] aggregate). A shard is range-contiguous in
    * `idCol` by construction, so `partitionBy(shard)` writes each file
    * from already-co-located rows — the assignment's range shuffle is
    * the ONLY full-data movement in the whole pack-and-write path, and
    * readers of one shard read one directory.
    */
  def writeShards(sharded: DataFrame, path: String): Unit = {
    sharded.write.partitionBy("shard").mode("overwrite").parquet(path)
    shardManifest(sharded).coalesce(1).write.mode("overwrite")
      .parquet(s"$path/_manifest")
  }
}
