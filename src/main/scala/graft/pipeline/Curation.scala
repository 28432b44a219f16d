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
  * near-dup candidate generation runs only on exact-dedup survivors
  * with the stop-shingle guard ON (the default `maxDocFreq`); the
  * near-dup drop set joins back by id (AQE broadcasts it when small);
  * split assignment is a pure expression. Every stage is an existing
  * scale-audited operator — this module only fixes their composition
  * and the audit contract.
  */
object Curation {

  /** Stage labels in the `status` audit column, in decision order. */
  val LangFiltered = "lang_filtered"
  val QualityFiltered = "quality_filtered"
  val ExactDup = "exact_dup"
  val NearDup = "near_dup"
  val Kept = "kept"

  /** Tuning knobs for [[curate]]; defaults are the safe at-scale points
    * of the underlying operators.
    */
  final case class Config(
      keepLangs: Seq[String] = Seq("en"),
      minQuality: Int = 40,
      nearDupThreshold: Double = 0.8,
      shingleSize: Int = 3,
      maxDocFreq: Int = 1000,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  /** Per-document curation audit: `(id, status, split)` for EVERY input
    * row, where `status` is the first stage that rejected the document
    * (or `kept`) and `split` is the deterministic content-hash split
    * label for kept documents, null otherwise.
    *
    * Decision rules (all deterministic):
    *   - language: `TextAnalysis.langId(text)` must be in
    *     `cfg.keepLangs`;
    *   - quality: `TextAnalysis.qualityScore(text) >= cfg.minQuality`;
    *   - exact: among filter survivors, the min-id row per distinct
    *     `md5(text)` is kept, later ids are `exact_dup`;
    *   - near: among exact survivors, exact n-gram Jaccard pairs at
    *     `cfg.nearDupThreshold` drop the HIGHER id of each pair (a doc
    *     is `near_dup` iff some earlier surviving doc is its near-dup —
    *     single pass, no transitive chasing, so the rule is a pure
    *     function of the pair set and replicable in the oracle);
    *   - split: `Sampling.hashSplitColumn(text)` on kept docs.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(),
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(cfg.keepLangs.nonEmpty, "keepLangs must be non-empty")
    val sc = CacheScope.resolve(scope, docs.sparkSession)

    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // staged langId: per-language scores computed once per row (the
    // inline Column form would triple the hottest replace() work)
    val staged = TextAnalysis.withLangId(base, "text", as = "_lang")
      .withColumn("_lang_ok", col("_lang").isin(cfg.keepLangs: _*))
      .withColumn("_q_ok",
        TextAnalysis.qualityScore(col("text")) >= cfg.minQuality)
      .drop("_lang")
    // exact-dedup rank among filter survivors only; rejected rows get a
    // unique synthetic key (rank 1 in a singleton window partition — no
    // all-rejects-in-one-partition skew, and their rank is never read)
    val pkey = when(col("_lang_ok") && col("_q_ok"), md5(col("text")))
      .otherwise(concat(lit("r:"), col("id").cast("string")))
    val ranked = sc.persist(staged.withColumn("_rn",
      row_number().over(Window.partitionBy(pkey).orderBy(col("id")))))

    val exactKept = ranked
      .filter(col("_lang_ok") && col("_q_ok") && col("_rn") === 1)
      .select("id", "text")
    val dropIds = Dedup.ngramJaccardPairs(exactKept, "id", "text",
        threshold = cfg.nearDupThreshold, shingleSize = cfg.shingleSize,
        maxDocFreq = cfg.maxDocFreq, scope = sc)
      .select(col("id_b").as("id")).distinct()
      .withColumn("_near_dup", lit(true))

    val status = when(!col("_lang_ok"), lit(LangFiltered))
      .when(!col("_q_ok"), lit(QualityFiltered))
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
}
