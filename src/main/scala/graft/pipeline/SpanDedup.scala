package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SPAN detection — the substring-level member of the
  * dedup suite (the "exact substring deduplication" of Lee et al. 2022,
  * arXiv:2107.06499): a fixed-width token window is slid over every
  * document, window content is hashed, and every occurrence of a
  * window seen elsewhere in the corpus EXCEPT its first (corpus order:
  * lowest (doc, start)) is flagged; flagged window starts merge into
  * maximal token spans per document. Sits between [[LineDedup]] (whole
  * repeated lines) and [[Dedup.ngramJaccardPairs]] (whole-document
  * similarity): it finds verbatim repeated REGIONS — licence blocks,
  * quoted passages, template paragraphs — wherever they sit inside
  * otherwise-distinct documents.
  *
  * Scale design (100 TB): the window table has one row per token
  * position — the honest cost of substring-level dedup in a
  * shuffle-based engine (the suffix-array construction of the paper is
  * the single-machine alternative; a hash-window pass is how the same
  * semantics distributes). Everything keyed by window hash is PARTIAL-
  * AGG ONLY: the first-occurrence rule is `min(struct(id, start))` per
  * hash — no rank window over the hash partition, so a window
  * duplicated 100M times combines map-side instead of serializing
  * through one hot reducer. The span merge is a per-document window
  * (bounded by document length). The rewrite joins each document's own
  * span list back by id and filters tokens through one higher-order
  * lambda — interpreted, not codegen, and documented as such: rewriting
  * is once-per-corpus work dominated by the window pass anyway.
  */
object SpanDedup {

  private def toks(textCol: Column): Column = split(trim(textCol), " ")

  /** (id, s, h): md5 of each `windowTokens`-token window, `s` the
    * 0-based token index of the window start. Documents shorter than
    * one window emit nothing.
    */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, s"windowTokens $windowTokens must be >= 1")
    val t = toks(col(textCol))
    docs
      .filter(size(t) >= windowTokens)
      .select(col(idCol).cast("long").as("id"),
        posexplode(transform(
          sequence(lit(0), size(t) - windowTokens),
          i => md5(concat_ws(" ",
            slice(t, i + 1, lit(windowTokens)))))).as(Seq("s", "h")))
  }

  /** Maximal duplicated token spans per document: every window
    * occurrence except the corpus-first one (lowest `(id, s)` per
    * hash), merged when overlapping or adjacent. Output
    * `(id, span_start, span_end)` with `span_end` exclusive, 0-based
    * token indices.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, docs.sparkSession)
    val w = sc.persist(windowHashes(docs, idCol, textCol, windowTokens))
    // first occurrence per hash by skew-safe partial aggregation —
    // deliberately NOT row_number() over the hash partition
    val firsts = w.groupBy("h")
      .agg(count(lit(1)).as("n"),
        min(struct(col("id"), col("s"))).as("first"))
      .filter(col("n") >= 2)
      .select(col("h"), col("first"))
    val flagged = w.join(firsts, "h")
      .filter(struct(col("id"), col("s")) =!= col("first"))
      .select(col("id"), col("s"))
    // merge flagged starts into maximal spans (gaps-and-islands; the
    // window partitions by document, bounded by document length)
    val byDoc = Window.partitionBy("id").orderBy("s")
    val prevEnd = max(col("s") + windowTokens)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    flagged
      .withColumn("_new", when(prevEnd.isNull ||
        col("s") > prevEnd, 1).otherwise(0))
      .withColumn("_island", sum(col("_new")).over(byDoc))
      .groupBy(col("id"), col("_island"))
      .agg(min(col("s")).as("span_start"),
        (max(col("s")) + windowTokens).as("span_end"))
      .drop("_island")
  }

  /** Rewrite `docs` with every duplicated span's tokens removed (the
    * corpus-first occurrence of each window stays — dedup, not
    * deletion). Output: id column (as `idCol`), `text`, `n_tokens`
    * (original), `n_removed` (tokens dropped).
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String,
      textCol: String, windowTokens: Int,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, windowTokens, scope)
      .groupBy("id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
    val t = toks(col(textCol))
    val joined = docs
      .select(col(idCol).cast("long").as("id"), t.as("_toks"))
      .join(spans, Seq("id"), "left")
    val inSpan: (Column, Column) => Column = (spansCol, i) =>
      exists(spansCol, sp =>
        i >= sp.getField("span_start") && i < sp.getField("span_end"))
    val kept = when(col("_spans").isNull, col("_toks"))
      .otherwise(filter(col("_toks"),
        (_, i) => !inSpan(col("_spans"), i)))
    joined.select(col("id").as(idCol),
      concat_ws(" ", kept).as("text"),
      size(col("_toks")).cast("long").as("n_tokens"),
      (size(col("_toks")) - size(kept)).cast("long").as("n_removed"))
  }
}
