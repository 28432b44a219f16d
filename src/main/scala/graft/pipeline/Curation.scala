package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed daily-driver shape of a
  * training-data pipeline: language filter → quality filter → exact
  * dedup → near-dup removal → deterministic split assignment, in that
  * fixed stage order, as ONE operator with a full per-document audit.
  *
  * Scale design (100 TB): the two cheap filters are pure codegen'd
  * Column predicates evaluated BEFORE any shuffle, so rejected rows
  * never pay dedup cost; exact dedup shuffles only filter survivors
  * (one window over `md5(text)`, rejected rows get synthetic singleton
  * partition keys so the audit frame has no null-key skew partition);
  * near-dup candidate generation runs only on exact-dedup survivors,
  * by default through MinHash banding (candidate volume bounded by
  * signature collisions — see [[NearDupStrategy]] for the measured
  * tradeoff vs the exact inverted shingle index); the near-dup drop
  * set joins back by id (AQE broadcasts it when small);
  * split assignment is a pure expression. Every stage is an existing
  * scale-audited operator — this module only fixes their composition
  * and the audit contract.
  */
object Curation {

  /** Stage labels in the `status` audit column, in decision order. */
  val LangFiltered = "lang_filtered"
  val QualityFiltered = "quality_filtered"
  val ModelFiltered = "model_filtered"
  val PiiFiltered = "pii_filtered"
  val RepetitionFiltered = "repetition_filtered"
  val LmFiltered = "lm_filtered"
  val CapFiltered = "cap_filtered"
  val ExactDup = "exact_dup"
  val NearDup = "near_dup"
  val Kept = "kept"

  /** Near-dup candidate strategy for the fourth stage. The drop RULE is
    * identical either way (higher id of each verified J≥threshold pair);
    * only candidate GENERATION differs:
    *
    *   - [[NearDupStrategy.Ngram]] — inverted shingle index; exact recall up to
    *     the stop-shingle guard. Candidate volume is Σ docFreq² over
    *     surviving shingles, so a TEMPLATE-dense corpus (many docs
    *     sharing mid-frequency boilerplate shingles) pays quadratically
    *     in family size: the 100× dry-run measured 1035 s at 500k docs
    *     with guard=1000, and tightening the guard to 50 cut it to 16 s
    *     but dropped boilerplate-connected recall to zero
    *     (PIPELINE_DRYRUN.md).
    *   - [[NearDupStrategy.MinHash]] — banded signature buckets; candidates are
    *     bounded by band collisions (probability ~J^(hashes/bands) per
    *     band), so family density costs linearly, at the documented
    *     per-pair collision-floor miss rate (~2 of 36k pairs at 10×,
    *     DEDUP_DRYRUN.md). Measured on the 100× template corpus: 39 s
    *     with the IDENTICAL drop set the 1035 s exact run produced —
    *     which is why it is the DEFAULT. Pin `Ngram` when exact recall
    *     through boilerplate shingles must be provable (the oracle
    *     queries do, with `maxDocFreq = 0`).
    */
  sealed trait NearDupStrategy
  object NearDupStrategy {
    final case class Ngram(maxDocFreq: Int = 1000) extends NearDupStrategy
    final case class MinHash(numHashes: Int = 64, bands: Int = 16,
        maxBucketSize: Int = 1000) extends NearDupStrategy
  }

  /** Tuning knobs for [[curate]]; defaults are the safe at-scale points
    * of the underlying operators. `maxPiiHits` (total email+IPv4+phone matches allowed;
    * `Int.MaxValue` = stage off) and `maxTokenRunPct` (reject when the
    * most frequent token exceeds this percent of all tokens; 100 = stage
    * off — integer percent so the comparison is exact integer math in
    * both engines) insert two more filter stages between quality and
    * exact dedup, and `minLmScore` (with `lmModel`/`lmVocabSize`) an
    * optional bigram-LM reference-likeness stage after them; `modelGate`
    * (+`minModelLogitQ`) inserts the trainable-classifier gate
    * ([[QualityModel]]) right after the heuristic quality stage;
    * `maxPerKey = Some((keyCol, cap))` inserts the per-key frequency
    * cap (the C4/RefinedWeb domain-diversity gate — no single domain
    * may contribute more than `cap` surviving documents) AFTER every
    * filter and BEFORE exact dedup, keeping the `cap` lowest-id filter
    * survivors per key via the skew-safe two-phase salted window
    * ([[Sampling.capPerKey]] — provably equal to the naive per-key
    * window). Full stage order:
    * language → quality → model → pii → repetition → lm → cap →
    * exact → near-dup → split.
    */
  final case class Config(
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Int = 40,
      nearDupThreshold: Double = 0.8,
      shingleSize: Int = 3,
      nearDup: NearDupStrategy = NearDupStrategy.MinHash(),
      transitiveNearDup: Boolean = false,
      maxPiiHits: Int = Int.MaxValue,
      maxTokenRunPct: Int = 100,
      minLmScore: Option[Double] = None,
      lmVocabSize: Int = 10000,
      lmModel: Option[LanguageModel.BigramLm] = None,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      modelGate: Option[QualityModel.LinearModel] = None,
      minModelLogitQ: Long = 0L,
      maxPerKey: Option[(String, Int)] = None)

  /** Per-document curation audit: `(id, status, split)` for EVERY input
    * row, where `status` is the first stage that rejected the document
    * (or `kept`) and `split` is the deterministic content-hash split
    * label for kept documents, null otherwise.
    *
    * Decision rules (all deterministic):
    *   - language: `TextAnalysis.langId(text)` must be in
    *     `cfg.keepLangs`;
    *   - quality: `TextAnalysis.qualityScore(text) >= cfg.minQuality`;
    *   - model (when `cfg.modelGate` set): the classifier's QUANTIZED
    *     logit must reach `cfg.minModelLogitQ`
    *     ([[QualityModel.logitQ]] — exact long comparison);
    *   - pii (when `cfg.maxPiiHits` set): total email+IPv4+phone
    *     matches must not exceed the cap;
    *   - repetition (when `cfg.maxTokenRunPct` set): the most frequent
    *     token's share of all tokens must not exceed the percent cap
    *     (integer math: `max_count * 100 <= n_tokens * pct`);
    *   - exact: among filter survivors, the min-id row per distinct
    *     `md5(text)` is kept, later ids are `exact_dup`;
    *   - near: among exact survivors, verified J≥threshold pairs from
    *     `cfg.nearDup`'s candidate strategy drop the HIGHER id of each
    *     pair (a doc is `near_dup` iff some earlier surviving doc is
    *     its near-dup — single pass, no transitive chasing, so the rule
    *     is a pure function of the pair set and replicable in the
    *     oracle); with `cfg.transitiveNearDup` the drop set is instead
    *     every non-minimum member of each CONNECTED COMPONENT of the
    *     pair graph ([[Clustering.connectedComponents]] — chains
    *     collapse fully; oracle = recursive-CTE closure);
    *   - split: `Sampling.hashSplitColumn(text)` on kept docs.
    */
  /** The six filter stages as one frame: `(id, text, _lang_ok, _q_ok,
    * _m_ok, _pii_ok, _rep_ok, _lm_ok)` — the decision columns [[curate]] and
    * [[Refresh.curateRefresh]] share, so a refreshed delta is filtered
    * by EXACTLY the batch rules (one definition, no drift).
    *
    * With `minLmScore` set and no `lmModel`, the LM self-trains on
    * `docs` — right for a one-shot batch, wrong for a delta (the model
    * must come from the reference corpus); refresh callers pass the
    * persisted model.
    */
  private[pipeline] def stageFlags(docs: DataFrame, idCol: String,
      textCol: String, cfg: Config, sc: CacheScope): DataFrame = {
    // null text = empty text: without the coalesce a null row's filter
    // predicates evaluate to null, every WHEN falls through, and the doc
    // lands in `kept` — empty text instead scores lang 'und'/quality 0
    // and is rejected at the first filter, deterministically
    val base = docs.select(col(idCol).as("id"),
      coalesce(col(textCol), lit("")).as("text"))
    // staged langId: per-language scores computed once per row (the
    // inline Column form would triple the hottest replace() work)
    val piiOk =
      if (cfg.maxPiiHits == Int.MaxValue) lit(true)
      else (TextAnalysis.emailCount(col("text")) +
        TextAnalysis.ipv4Count(col("text")) +
        TextAnalysis.phoneCount(col("text"))) <= cfg.maxPiiHits
    // integer-exact repetition rule: most-frequent-token count as a
    // percent of all tokens (shuffle-free sorted-run fold)
    val repOk =
      if (cfg.maxTokenRunPct >= 100) lit(true)
      else TextAnalysis.maxTokenCount(col("text")) * 100 <=
        TextAnalysis.tokenCount(col("text")) * cfg.maxTokenRunPct
    // optional trainable-classifier gate (the CCNet/RefinedWeb
    // model-based stage, sibling of the heuristic quality gate): pure
    // Column predicate on the QUANTIZED logit, so the stage is as
    // oracle-exact as the scorer itself
    val modelOk = cfg.modelGate match {
      case Some(m) =>
        QualityModel.logitQ(col("text"), m) >= cfg.minModelLogitQ
      case None => lit(true)
    }
    val staged0 = TextAnalysis.withLangId(base, "text", as = "_lang")
      .withColumn("_lang_ok", col("_lang").isin(cfg.keepLangs: _*))
      .withColumn("_q_ok",
        TextAnalysis.qualityScore(col("text")) >= cfg.minQuality)
      .withColumn("_m_ok", modelOk)
      .withColumn("_pii_ok", piiOk)
      .withColumn("_rep_ok", repOk)
      .drop("_lang")
    // optional LM-quality stage (CCNet shape): reference-likeness by
    // bigram-LM score, joined per id — the one filter that is not a
    // pure Column predicate. The model is caller-supplied (production:
    // trained offline on a REFERENCE corpus) or self-trained on the
    // input; a NULL score (fewer than two tokens) REJECTS — a document
    // the model cannot certify is not certified.
    cfg.minLmScore match {
      case Some(thr) =>
        val model = cfg.lmModel.getOrElse(LanguageModel.train(
          base, "id", "text", cfg.lmVocabSize, sc))
        val scores = LanguageModel.score(base, "id", "text", model,
            scope = sc)
          .select(col("doc_id").as("id"), col("lm_score"))
        staged0.join(scores, Seq("id"), "left")
          .withColumn("_lm_ok",
            col("lm_score").isNotNull && col("lm_score") >= thr)
          .drop("lm_score")
      case None => staged0.withColumn("_lm_ok", lit(true))
    }
  }

  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(cfg.keepLangs.nonEmpty, "keepLangs must be non-empty")
    val sc = CacheScope.resolve(scope, docs.sparkSession)
    val staged0 = stageFlags(docs, idCol, textCol, cfg, sc)
    val filtersOk = col("_lang_ok") && col("_q_ok") && col("_m_ok") &&
      col("_pii_ok") && col("_rep_ok") && col("_lm_ok")
    // optional per-key frequency cap among filter survivors: the cap
    // key joins back from the input by id (hash-width), survivors rank
    // per key in id order through the skew-safe salted two-phase
    // window, and rows past the cap take `_cap_ok = false`. Rows a
    // filter already rejected keep `_cap_ok = true` (the status chain
    // reports the FIRST rejecting stage, and the cap never saw them).
    val staged = cfg.maxPerKey match {
      case None => staged0.withColumn("_cap_ok", lit(true))
      case Some((key, cap)) =>
        val keyed = staged0.join(
          docs.select(col(idCol).as("id"), col(key).as("_capkey")),
          Seq("id"))
        val survivors = keyed.filter(filtersOk)
          .select(col("id"), col("_capkey"))
        val kept = Sampling.capPerKey(survivors, "_capkey", "id", cap)
          .select(col("id"), lit(true).as("_cap_keep"))
        keyed.join(kept, Seq("id"), "left")
          .withColumn("_cap_ok",
            !filtersOk || coalesce(col("_cap_keep"), lit(false)))
          .drop("_capkey", "_cap_keep")
    }
    // exact-dedup rank among filter+cap survivors only; rejected rows
    // get a unique synthetic key (rank 1 in a singleton window
    // partition — no all-rejects-in-one-partition skew, and their rank
    // is never read)
    val pkey = when(filtersOk && col("_cap_ok"), md5(col("text")))
      .otherwise(concat(lit("r:"), col("id").cast("string")))
    val ranked = sc.persist(staged.withColumn("_rn",
      row_number().over(Window.partitionBy(pkey).orderBy(col("id")))))

    val exactKept = ranked
      .filter(filtersOk && col("_cap_ok") && col("_rn") === 1)
      .select("id", "text")
    val pairs = cfg.nearDup match {
      case NearDupStrategy.Ngram(maxDocFreq) =>
        Dedup.ngramJaccardPairs(exactKept, "id", "text",
          threshold = cfg.nearDupThreshold, shingleSize = cfg.shingleSize,
          maxDocFreq = maxDocFreq, scope = sc)
      case NearDupStrategy.MinHash(numHashes, bands, maxBucketSize) =>
        Dedup.minhashPairs(exactKept, "id", "text",
          threshold = cfg.nearDupThreshold, numHashes = numHashes,
          bands = bands, shingleSize = cfg.shingleSize,
          maxBucketSize = maxBucketSize, scope = sc)
    }
    // near-dup drop set. Single-pass (default): the higher id of each
    // verified pair — a pure function of the pair set, windowless in the
    // oracle. Transitive: connected components over the pair graph, drop
    // every non-minimum member — A~B~C collapses to {A} even though
    // (A,C) was never a pair, so no B-shaped bridge of a near-dup chain
    // survives. Both keep the same rule family (min id survives).
    val dropIds = (if (cfg.transitiveNearDup)
        Clustering.connectedComponents(pairs, scope = sc)
          .filter(col("id") =!= col("cluster_id")).select(col("id"))
      else pairs.select(col("id_b").as("id")).distinct())
      .withColumn("_near_dup", lit(true))

    val status = when(!col("_lang_ok"), lit(LangFiltered))
      .when(!col("_q_ok"), lit(QualityFiltered))
      .when(!col("_m_ok"), lit(ModelFiltered))
      .when(!col("_pii_ok"), lit(PiiFiltered))
      .when(!col("_rep_ok"), lit(RepetitionFiltered))
      .when(!col("_lm_ok"), lit(LmFiltered))
      .when(!col("_cap_ok"), lit(CapFiltered))
      .when(col("_rn") > 1, lit(ExactDup))
      .when(col("_near_dup"), lit(NearDup))
      .otherwise(lit(Kept))
    ranked.join(dropIds, Seq("id"), "left")
      .withColumn("status", status)
      .withColumn("split",
        when(col("status") === Kept,
          Sampling.hashSplitColumn(col("text"), cfg.splits)))
      .select(col("id").as(idCol), col("status"), col("split"))
  }

  /** Benchmark-contamination report: for every corpus document sharing at
    * least one word `n`-gram with the benchmark set, its shingle count and
    * the number of distinct shingles also present in ANY benchmark text —
    * the decontamination signal every serious training pipeline runs
    * before a benchmark is trusted (n-gram overlap, the standard public
    * methodology). Callers drop or flag rows where
    * `n_overlap / n_shingles` crosses their policy line; the report keeps
    * raw integers so the policy stays caller-side and oracle-portable.
    *
    * Scale design (100 TB): benchmark suites are MB-scale while the corpus
    * is the 100 TB side, so the benchmark shingle set is explicitly
    * `broadcast()` — the corpus is scanned ONCE, map-side joined (no
    * corpus shuffle), and only matching (doc, shingle) rows reach the one
    * `groupBy(id)` shuffle, whose volume is bounded by hits, not corpus
    * size.
    */
  def contamination(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      shingleSize: Int = 3): DataFrame = {
    // both sides shingle through the HASHED JVM kernel (the same one the
    // ngram dedup family uses): one compiled pass per row, longs instead
    // of shingle strings at the join — the Column-expression form paid
    // an interpreted double shingle build per doc (~14x slower measured
    // at sf0.1). Hash-collision odds are the family's documented
    // n²/2⁶⁵ — the oracle checks exact counts and stays green.
    val docSh = Dedup.shingleIndex(docs.select(col(idCol), col(textCol)),
      idCol, textCol, shingleSize) // (id, nsh = distinct count, s)
    val benchSh = Dedup.shingleIndex(
        benchmark.select(monotonically_increasing_id().as("__bid"),
          col(benchTextCol)),
        "__bid", benchTextCol, shingleSize)
      .select(col("s")).distinct()
    docSh.join(broadcast(benchSh), "s")
      .groupBy(col("id"), col("nsh"))
      .agg(count(lit(1)).cast("int").as("n_overlap"))
      .select(col("id").as(idCol), col("nsh").as("n_shingles"),
        col("n_overlap"))
    // count, not countDistinct: the kernel emits each distinct shingle
    // hash once per doc and the benchmark side is distinct'd above
  }

  /** The curated corpus itself: input rows that survive every stage,
    * with their split label — `curate` filtered to `kept`, joined back
    * to the full input row so no caller column is lost.
    */
  def curated(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      scope: CacheScope = CacheScope.session): DataFrame = {
    val audit = curate(docs, idCol, textCol, cfg, scope)
      .filter(col("status") === Kept).drop("status")
    docs.join(audit, Seq(idCol))
  }

  /** END-TO-END training-run preparation, raw corpus → packed sequence
    * assignment in one call: [[curate]] (language → quality → optional
    * PII/repetition → exact → near-dup → split) keeps the `split` docs,
    * [[Sampling.permuted]] orders them by the engine-portable md5(seed)
    * permutation, and [[Sharding.packSequences]] concat-and-chunks the
    * token stream into `maxLen` training sequences. Output: the kept
    * rows + `_order` + `_tokens` + `(seq, seq_offset, n_seqs)`; feed it
    * to [[Sharding.writeShards]] keyed however the trainer reads.
    *
    * Shuffle budget at 100 TB: curate's own passes + ONE join back to
    * the corpus for text recovery (the audit carries only ids) + the
    * ONE range exchange the permutation/packing shares — the permute
    * and the pack are the same shuffle, and every stage before it has
    * already shrunk the data to the kept `split` subset.
    */
  def prepareTrainingSequences(docs: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config(), seed: String = "train",
      maxLen: Long = 2048, split: String = "train",
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(cfg.splits.exists(_._1 == split),
      s"split '$split' is not one of the configured splits " +
        cfg.splits.map(_._1).mkString("[", ",", "]"))
    // [[curated]] keeps EVERY caller column (url/lang/source metadata
    // rides through to the written shards), + the split label we filter
    val kept = curated(docs, idCol, textCol, cfg, scope)
      .filter(col("split") === split).drop("split")
    Sharding.packSequences(
      Sampling.permuted(kept, idCol, seed), "_order",
      TextAnalysis.tokenEstimate(col(textCol)), maxLen)
  }
}
