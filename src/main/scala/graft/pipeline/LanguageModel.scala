package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** N-gram language-model quality scoring — the CCNet-style "how much
  * does this document look like the reference corpus" signal used to
  * rank crawl text for LLM training. A bigram model with add-one
  * smoothing over a capped vocabulary is trained as two corpus
  * aggregations; scoring is a per-document mean of smoothed bigram
  * probabilities.
  *
  * Two score forms, same ranking intent:
  *  - DEFAULT (oracle-gated): mean of per-bigram probabilities with
  *    each probability quantized to `floor(p * 1e9)` BEFORE summation.
  *    Every step — integer adds, one correctly-rounded double divide,
  *    one multiply, floor — is IEEE-identical across engines, and the
  *    sum runs over exact longs, so the result is bit-reproducible on
  *    any partitioning AND in the DuckDB oracle (double `+` is not
  *    associative, so an unquantized double sum would depend on
  *    partition order).
  *  - `logProb = true` (opt-in, NOT oracle-gated): classical mean
  *    log-probability and perplexity. `ln` is not guaranteed
  *    correctly-rounded identically across libm implementations — the
  *    same reason tf-idf's log form is non-oracled.
  *
  * Scale contract (100 TB): the vocabulary is a TakeOrdered top-k
  * (only `vocabSize` rows ever reach the driver) and broadcasts to the
  * token-mapping join; unigram counts are ≤ vocabSize+1 rows and
  * broadcast to scoring; bigram counts shuffle on (w1, w2) — the
  * honest corpus aggregation — and the scoring join is keyed the same
  * way (AQE broadcasts it when the trained model is small). Bigram
  * formation is one exchange on doc_id + a sorted window pass.
  */
object LanguageModel {

  val unkToken = "<unk>"

  /** Trained bigram model. `smoothingV` is parameter-defined
    * (vocabSize + 1 for `<unk>`), not data-derived, so two engines can
    * never disagree about the smoothing denominator.
    */
  case class BigramLm(vocab: DataFrame, unigrams: DataFrame,
      bigrams: DataFrame, vocabSize: Int) {
    def smoothingV: Long = vocabSize + 1L
  }

  /** Lowercased whitespace tokens with their position, exploded to
    * rows (same tokenization as TextAnalysis.vocabulary — one
    * tokenizer across the engine).
    */
  private def positionedTokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)

  /** Map raw tokens onto the capped vocabulary; out-of-vocabulary
    * tokens collapse to `<unk>`. The vocab is top-k — broadcast.
    */
  private def mapToVocab(toks: DataFrame, vocab: DataFrame): DataFrame =
    toks.join(broadcast(vocab.withColumn("_graft_inv", lit(1))),
        Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("_graft_inv").isNotNull, col("tok"))
          .otherwise(lit(unkToken)).as("vtok"))

  /** (doc_id, w1, w2) bigram rows from vocabulary-mapped tokens: one
    * exchange on doc_id, lag over position order. Adjacency is over
    * surviving (non-empty) tokens.
    */
  private def bigramRows(mapped: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    mapped.withColumn("w1", lag(col("vtok"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(col("doc_id"), col("w1"), col("vtok").as("w2"))
  }

  /** Train a bigram model over `df`: top-`vocabSize` vocabulary by
    * (count desc, token asc), unigram context counts, bigram counts.
    */
  def train(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 10000,
      scope: CacheScope = CacheScope.session): BigramLm = {
    require(vocabSize > 0, "vocabSize must be > 0")
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val toks = positionedTokens(df, idCol, textCol)
    val vocab = sc.persist(toks.groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("tok"))
      .limit(vocabSize)
      .select("tok"))
    // mapped tokens feed BOTH count aggregates — persist so the text
    // explode and the vocab join run once
    val mapped = sc.persist(mapToVocab(toks, vocab))
    val unigrams = mapped.groupBy(col("vtok").as("w1"))
      .agg(count(lit(1)).cast(LongType).as("cu"))
    val bigrams = bigramRows(mapped).groupBy("w1", "w2")
      .agg(count(lit(1)).cast(LongType).as("cb"))
    BigramLm(vocab, unigrams, bigrams, vocabSize)
  }

  /** Score every document of `df` against `model`: `(doc_id,
    * n_bigrams, lm_score)` — the quantized-probability mean described
    * above (higher = more reference-like; docs with fewer than two
    * tokens keep a NULL score). With `logProb = true`, instead emits
    * `(doc_id, n_bigrams, avg_logprob, perplexity)` (non-oracled).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: BigramLm, logProb: Boolean = false,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val big = bigramRows(
      mapToVocab(positionedTokens(df, idCol, textCol), model.vocab))
    val p = (coalesce(col("cb"), lit(0L)) + lit(1L)).cast(DoubleType) /
      (col("cu") + lit(model.smoothingV)).cast(DoubleType)
    val joined = big
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(broadcast(model.unigrams), Seq("w1"))
    val perDoc =
      if (logProb)
        joined.select(col("doc_id"), log(p).as("lp"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
            sum(col("lp")).as("slp"))
      else
        joined.select(col("doc_id"),
            floor(lit(1e9) * p).cast(LongType).as("qp"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
            sum(col("qp")).cast(LongType).as("sq"))
    val ids = df.select(col(idCol).as("doc_id"))
    val out = ids.join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams",
        coalesce(col("n_bigrams"), lit(0L)))
    if (logProb)
      out.withColumn("avg_logprob",
          col("slp") / col("n_bigrams").cast(DoubleType))
        .withColumn("perplexity", exp(-col("avg_logprob")))
        .select("doc_id", "n_bigrams", "avg_logprob", "perplexity")
    else
      out.withColumn("lm_score", col("sq").cast(DoubleType) /
          (col("n_bigrams").cast(DoubleType) * lit(1e9)))
        .select("doc_id", "n_bigrams", "lm_score")
  }

  /** Merge two models trained over the SAME vocabulary by adding their
    * counts — the daily-refresh shape: train a small model on today's
    * batch with yesterday's vocabulary (`train` on the batch, then
    * merge), instead of re-aggregating the whole history. The
    * vocabulary stays FIXED across merges deliberately: a stable vocab
    * is what makes daily scores comparable day over day (re-deriving
    * top-k on the union would silently re-map `<unk>`). Refuses
    * vocabulary mismatches instead of producing inconsistent counts.
    * Counts-additivity makes merge equal to training once on the
    * concatenated corpus under that fixed vocab.
    */
  def merge(a: BigramLm, b: BigramLm): BigramLm = {
    require(a.vocabSize == b.vocabSize,
      s"vocabSize mismatch: ${a.vocabSize} vs ${b.vocabSize}")
    val onlyA = a.vocab.join(b.vocab, Seq("tok"), "left_anti").count()
    val onlyB = b.vocab.join(a.vocab, Seq("tok"), "left_anti").count()
    require(onlyA == 0 && onlyB == 0,
      s"vocabularies differ ($onlyA tokens only in left, $onlyB only " +
        "in right) — merged counts would be inconsistent; retrain with " +
        "a shared vocab (train the daily batch with trainWithVocab)")
    BigramLm(a.vocab,
      a.unigrams.unionByName(b.unigrams).groupBy("w1")
        .agg(sum(col("cu")).cast(LongType).as("cu")),
      a.bigrams.unionByName(b.bigrams).groupBy("w1", "w2")
        .agg(sum(col("cb")).cast(LongType).as("cb")),
      a.vocabSize)
  }

  /** Train counts over `df` under a FIXED, caller-supplied vocabulary
    * (no top-k derivation) — the per-batch half of the daily-refresh
    * pattern: `merge(yesterday, trainWithVocab(batch, yesterday))`.
    */
  def trainWithVocab(df: DataFrame, idCol: String, textCol: String,
      base: BigramLm,
      scope: CacheScope = CacheScope.session): BigramLm = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val mapped = sc.persist(
      mapToVocab(positionedTokens(df, idCol, textCol), base.vocab))
    val unigrams = mapped.groupBy(col("vtok").as("w1"))
      .agg(count(lit(1)).cast(LongType).as("cu"))
    val bigrams = bigramRows(mapped).groupBy("w1", "w2")
      .agg(count(lit(1)).cast(LongType).as("cb"))
    BigramLm(base.vocab, unigrams, bigrams, base.vocabSize)
  }

  /** Persist a trained model as a parquet sidecar triple plus a params
    * file, so daily scoring runs never re-train (the minhash/IVF index
    * discipline: the sidecar is self-describing and reads refuse a
    * vocabSize mismatch instead of silently rescaling the smoothing).
    */
  def writeLm(model: BigramLm, path: String): Unit = {
    model.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    model.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path).resolve("params.json"),
      s"""{"format":"graft-bigram-lm-v1","vocabSize":${model.vocabSize}}""")
  }

  def readLm(spark: SparkSession, path: String,
      expectVocabSize: Option[Int] = None): BigramLm = {
    val params = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path).resolve("params.json"))
    val vs = """"vocabSize":(\d+)""".r.findFirstMatchIn(params)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"$path/params.json has no vocabSize: $params"))
    expectVocabSize.foreach(e => require(e == vs,
      s"LM index at $path was trained with vocabSize=$vs, " +
        s"caller expected $e — retrain or drop the override"))
    BigramLm(
      spark.read.parquet(s"$path/vocab"),
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/bigrams"), vs)
  }
}
