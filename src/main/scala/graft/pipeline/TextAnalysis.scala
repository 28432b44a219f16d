package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Text-analysis operators for training-data pipelines over a `text` column.
  * All pure Column expressions (codegen-friendly, no UDFs) and — by design —
  * exactly replicable in ANSI SQL for the DuckDB oracle: integer arithmetic
  * only, no regex classes with engine-specific semantics.
  */
object TextAnalysis {

  /** Occurrences of `needle` in `haystack` via length arithmetic — exact and
    * portable across engines (plain `replace`, no regex).
    */
  def occ(h: Column, needle: String): Column =
    ((length(h) - length(replaceLit(h, needle))) / needle.length)
      .cast(IntegerType)

  private def replaceLit(h: Column, needle: String): Column =
    call_function("replace", h, lit(needle), lit(""))

  /** Whitespace token count; 0 for empty/blank strings. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))
      .cast(IntegerType)

  /** Punctuation marks that BPE-style tokenizers split into their own
    * tokens (shared with the oracle SQL generator).
    */
  val bpePunct: Seq[String] = Seq(".", ",", "!", "?", ";", ":")

  /** BPE-ish token-count estimate, portable to the oracle: whitespace
    * words + punctuation marks (sub-word tokenizers emit punctuation as
    * separate tokens), floored by the classic ~4-chars-per-token rule
    * for long unbroken text. Deterministic integer arithmetic only —
    * an ESTIMATE for budget/packing decisions, not a tokenizer.
    */
  def tokenEstimate(text: Column): Column = {
    val punct = bpePunct.map(p => occ(text, p)).reduce(_ + _)
    greatest(tokenCount(text) + punct,
      ((length(text) + 3) / 4).cast(IntegerType))
      .cast(IntegerType)
  }

  /** Stopword-occurrence votes per language (space-delimited probes so
    * substrings of bigger words don't count).
    */
  val langProbes: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " est "),
    "es" -> Seq(" el ", " de la ", " los ", " es ", " y "),
    "it" -> Seq(" il ", " di ", " che ", " e ", " la "))

  def langScore(text: Column, lang: String): Column =
    langProbes(lang).map(p => occ(lower(text), p))
      .reduce(_ + _)

  /** N-gram/stopword heuristic language ID with a deterministic tie
    * order; unknown ("und") when no probe fires. Dispatches to the
    * native codegen'd kernel ([[graft.functions.TextExpressions
    * .langIdC]]) — one lowercase pass + greedy byte-scans instead of
    * the 25 per-probe `replace` allocations of the Column tree below;
    * same scores, tie order, and oracle contract bit-for-bit
    * (TextExpressionsSpec pins corpus-wide parity). NULL text is "und"
    * — the Column tree's null-comparison fallthrough lands on the
    * otherwise("und") arm and the SQL oracle's CASE does the same, so
    * the native kernel's null is coalesced to match.
    */
  def langId(text: Column): Column =
    coalesce(graft.functions.TextExpressions.langIdC(text), lit("und"))

  /** The portable Column-tree spelling of [[langId]] — `occ()`
    * arithmetic that mirrors the DuckDB oracle symbol for symbol; kept
    * as the executable specification the native kernel is tested
    * against.
    */
  private[graft] def langIdColumnTree(text: Column): Column = {
    val order = Seq("en", "de", "fr", "es", "it")
    val scores = order.map(l => l -> langScore(text, l))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val winner = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
    // foldRight means earlier languages win ties (en > de > fr > es > it)
    winner
  }

  /** `df` plus a language column. Historically this staged per-language
    * scores into their own projection to keep the Column-tree spelling
    * from inlining every score ~3×; the native kernel computes all
    * scores in one pass, so the staging is gone and this is now just
    * the one-column form of [[langId]].
    */
  def withLangId(df: DataFrame, textCol: String,
      as: String = "lang"): DataFrame =
    df.withColumn(as, langId(col(textCol)))

  /** Integer quality score 0..100 from length, alpha ratio and token stats:
    *   40 * clamp(tokens/20) + 30 * alphaRatio + 30 * avgWordLen in [3,12].
    * Pure integer arithmetic (portable to the oracle).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    val len = length(text)
    val spaces = occ(text, " ")
    val lenComponent = least(toks, lit(20)) * 2 // 0..40
    val letters = length(regexp_replace(text, "[^A-Za-z]", ""))
    val alphaComponent = when(len > 0, letters * 30 / len)
      .otherwise(lit(0)) // 0..30
    val avgWordLen = when(toks > 0, (len - spaces) / toks).otherwise(lit(0))
    val wordComponent = when(avgWordLen >= 3 && avgWordLen <= 12, lit(30))
      .when(avgWordLen > 0, lit(10)).otherwise(lit(0))
    (lenComponent + alphaComponent + wordComponent).cast(IntegerType)
  }

  /** 64-bit rolling document fingerprint over whitespace tokens:
    * h' = xxhash64(h, token), left-to-right. Order-sensitive,
    * whitespace-insensitive, overflow-free under ANSI mode.
    */
  def fingerprint(text: Column): Column =
    aggregate(split(trim(text), "\\s+"), lit(0L),
      (acc, tok) => xxhash64(acc, tok))

  /** Per-language aggregate profile of a documents table. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(langId(col(textCol)).as("lang_detected"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast(LongType)).as("total_tokens"),
        avg(qualityScore(col(textCol))).as("avg_quality"))

  // ------------------------------------------------------------------ PII
  // Patterns are deliberately written to the COMMON subset of Java regex
  // (Spark codegen) and RE2 (the DuckDB oracle): no lookaround, no
  // backreferences, ASCII classes, `\b` (an ASCII word boundary in both).
  // Both engines scan leftmost non-overlapping with the same greedy
  // semantics on these alternation-free patterns, so counts and global
  // replacement are bit-identical. Conservative by design — a pipeline
  // PRE-FILTER signal (flag/redact for review), not a compliance scanner.

  /** Email addresses (user@host.tld, tld >= 2 alpha). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literals, word-bounded. */
  val ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** E.164-shaped phone numbers: '+' then 9-15 digits. */
  val phonePattern = "\\+[0-9]{9,15}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern)).cast(IntegerType)

  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(ipv4Pattern)).cast(IntegerType)

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(phonePattern)).cast(IntegerType)

  /** All PII matches replaced with typed markers. Emails first (an email
    * can embed digit runs the narrower patterns would then see), then
    * IPv4, then phone — the order is part of the contract and mirrored
    * in the oracle SQL. Pure codegen'd expressions; at 100 TB this is a
    * map-only pass with no shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Markup stripping — the web-scrape EXTRACTION stage that feeds
    * every text operator downstream: drop `<script>`/`<style>` blocks
    * whole (their content is code, not prose), HTML comments, then all
    * remaining tags; decode the six entities that survive into prose
    * (`&nbsp; &lt; &gt; &quot; &#39; &amp;` — amp LAST, the standard
    * order, so `&amp;lt;` decodes to the literal `&lt;` and not `<`);
    * collapse whitespace and trim. Pure codegen'd expressions (regex +
    * literal replaces, all replayable in the oracle — no backreferences
    * or lookarounds, so the patterns mean the same thing to Java regex
    * and RE2); at 100 TB this is a map-only pass with no shuffle.
    */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(
      regexp_replace(noBlocks, "(?s)<!--.*?-->", " "), "<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) =>
        call_function("replace", c, lit(k), lit(v))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-row PII stat columns appended to `df`. */
  def withPiiStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_email", emailCount(col(textCol)))
      .withColumn("n_ip", ipv4Count(col(textCol)))
      .withColumn("n_phone", phoneCount(col(textCol)))

  // ----------------------------------------------------------- URLs
  // Same Java-regex ∩ RE2 discipline as the PII patterns.

  /** http(s) URLs; host chars conservative, path = non-space tail. */
  val urlPattern = "https?://[A-Za-z0-9.-]+(/[^ ]*)?"

  /** Host-capturing prefix used for domain extraction. */
  val domainPattern = "https?://([A-Za-z0-9.-]+)"

  def urlCount(text: Column): Column =
    regexp_count(text, lit(urlPattern)).cast(IntegerType)

  /** Array of every URL host in the text, in order (C4-style per-domain
    * accounting: explode → groupBy(domain) for corpus domain stats or a
    * broadcast blocklist anti-join).
    */
  def domains(text: Column): Column =
    regexp_extract_all(text, lit(domainPattern), lit(1))

  // ----------------------------------------------------- repetition
  // Within-document repetition signals (the Gopher-rules family):
  // heavily repeated tokens / n-grams are the classic low-quality and
  // boilerplate tell. Computed WITHOUT a shuffle: the naive shape is
  // explode → groupBy(doc, gram) → max, which shuffles every token of a
  // 100 TB corpus twice; instead the most-frequent-gram count equals
  // the longest equal-run in the SORTED gram array — a per-row
  // `array_sort` + one `aggregate` fold, pure codegen'd expressions,
  // map-only at any scale.

  private def lowerWords(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Count of the most frequent element of `arr` (0 for empty). */
  private def maxRunCount(arr: Column): Column = {
    val init = struct(lit(null).cast("string").as("prev"),
      lit(0).as("run"), lit(0).as("best"))
    val folded = aggregate(array_sort(arr), init, (acc, x) => {
      val run = when(acc("prev").isNotNull && acc("prev") === x,
        acc("run") + 1).otherwise(lit(1))
      struct(x.as("prev"), run.as("run"),
        greatest(acc("best"), run).as("best"))
    })
    folded("best").cast(IntegerType)
  }

  /** Occurrences of the most frequent token (lowercased, whitespace
    * split). 1 for a text with no repeated token.
    */
  def maxTokenCount(text: Column): Column = maxRunCount(lowerWords(text))

  /** Occurrences of the most frequent word bigram; 0 when the text has
    * fewer than two words.
    */
  def maxBigramCount(text: Column): Column = {
    val words = lowerWords(text)
    val n = size(words)
    val bigrams = transform(sequence(lit(1), n - 1),
      i => concat_ws(" ", element_at(words, i),
        element_at(words, i + 1)))
    when(n < 2, lit(0)).otherwise(maxRunCount(bigrams))
  }

  /** Distinct-token count (lowercased). */
  def distinctTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(array_distinct(lowerWords(text))))
      .cast(IntegerType)

  /** Repetition profile columns appended to `df`: token counts plus the
    * most-frequent token/bigram multiplicities — the caller derives its
    * policy ratios (e.g. `max_token_count / n_tokens`) so the report
    * stays integer-exact and oracle-portable. Column-expression form
    * (composable, SQL-surface-able); for a corpus-wide report prefer
    * [[repetitionStatsKernel]] — same values, one compiled pass.
    */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_distinct_tokens", distinctTokenCount(col(textCol)))
      .withColumn("max_token_count", maxTokenCount(col(textCol)))
      .withColumn("max_bigram_count", maxBigramCount(col(textCol)))

  /** The repetition profile as a typed JVM kernel — identical values to
    * [[withRepetitionStats]] (parity-spec'd), one compiled hash-count
    * pass per row instead of interpreted higher-order-function lambdas
    * (Spark's `aggregate`/`transform` lambdas never enter whole-stage
    * codegen; the fold form measured ~10x slower at sf0.1). Map-only,
    * no shuffle. Returns `(idCol, n_tokens, n_distinct_tokens,
    * max_token_count, max_bigram_count)`.
    */
  def repetitionStatsKernel(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df.select(col(idCol).cast("long"),
        col(textCol).cast("string")))
      .as[(Long, String)]
      .map { case (id, text0) =>
        val trimmed = (if (text0 == null) "" else text0).trim
        val words = trimmed.toLowerCase.split("\\s+")
        val blank = trimmed.isEmpty
        val nTokens = if (blank) 0 else words.length
        val tok = new java.util.HashMap[String, Integer]()
        var maxTok = 0
        var i = 0
        while (i < words.length) {
          val c = tok.merge(words(i), 1, (a, b) => a + b)
          if (c > maxTok) maxTok = c
          i += 1
        }
        var maxBi = 0
        if (words.length >= 2) {
          val bi = new java.util.HashMap[String, Integer]()
          var j = 0
          while (j < words.length - 1) {
            val c = bi.merge(words(j) + " " + words(j + 1), 1,
              (a, b) => a + b)
            if (c > maxBi) maxBi = c
            j += 1
          }
        }
        (id, nTokens, if (blank) 0 else tok.size, maxTok, maxBi)
      }.toDF(idCol, "n_tokens", "n_distinct_tokens", "max_token_count",
        "max_bigram_count")
  }

  // ----------------------------------------------------- vocabulary / tf-idf
  // Corpus-level token statistics: the vocab table a tokenizer trains on
  // and the per-document keyword extraction a filtering/labeling stage
  // uses. Both are corpus aggregations, so (unlike the repetition family
  // above) a shuffle on the token key is the honest minimum — the scale
  // discipline is map-side partial aggregation and a TakeOrdered top-k,
  // never a global sort of the vocabulary.

  /** Lowercased whitespace tokens of one document, exploded to rows. */
  private def explodedTokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Corpus vocabulary: the top-`k` tokens by total occurrence count
    * with document frequency alongside — `(tok, n, n_docs)` ordered by
    * count desc, token asc.
    *
    * Scale: explode → one hash aggregate on `tok` (partial map-side
    * combine; the distinct doc count plans as Expand + two-phase agg,
    * still keyed on `tok` — no all-to-one hotspot); the global top-k is
    * TakeOrderedAndProject, so only `k` rows ever reach the driver and
    * the full vocabulary is never sorted.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    explodedTokens(df, idCol, textCol)
      .groupBy("tok")
      .agg(count(lit(1)).cast(LongType).as("n"),
        countDistinct(col("doc_id")).cast(LongType).as("n_docs"))
      .orderBy(desc("n"), col("tok"))
      .limit(k)

  /** Per-document top-`k` keywords by tf-idf: `(doc_id, tok, tf,
    * n_docs, score, rank)`.
    *
    * The default score is the LOG-FREE ratio form
    * `tf * ((N + 1) / (n_docs + 1))` with the idf parenthesized first:
    * integer counts, one double divide, one multiply — every step
    * IEEE-exact and identically ordered in Spark and DuckDB, so the
    * oracle reproduces the doubles bit-for-bit. `ln` is NOT guaranteed
    * correctly-rounded the same way across libm implementations, so the
    * classical `tf * ln((N+1)/(n_docs+1))` (same ranking intent) is the
    * opt-in `logIdf = true` variant, excluded from the oracle gate.
    *
    * Scale: tf = hash agg on `(doc_id, tok)`; doc frequency = the same
    * exploded frame aggregated on `tok`; their join shuffles on `tok`
    * (both sides already partitioned by it from their aggregates); the
    * rank window partitions by `doc_id` — keyed, never a single global
    * window. `N` is one count scalar computed up front (the IVF
    * centroid pattern: small-by-contract driver state, broadcast as a
    * literal).
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int, logIdf: Boolean = false,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val sc = CacheScope.resolve(scope, df.sparkSession)
    val n = df.count()
    val toks = explodedTokens(df, idCol, textCol)
    // tf holds exactly one row per (doc_id, tok); BOTH the join's tf
    // side and the document-frequency aggregate read it, and column
    // pruning diverges the two subtrees enough that Spark cannot reuse
    // the exchange — persist it (scoped, releasable) so the text
    // explode, the dominant cost at scale, executes ONCE
    val tf = sc.persist(toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).cast(LongType).as("tf")))
    val dfreq = tf.groupBy("tok")
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
    val idf = (lit((n + 1).toDouble)) / (col("n_docs").cast(DoubleType) + 1.0d)
    val scored = tf.join(dfreq, "tok")
      .withColumn("score", col("tf").cast(DoubleType) *
        (if (logIdf) log(idf) else idf))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(desc("score"), col("tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("tok"), col("tf"), col("n_docs"),
        col("score"), col("rank"))
  }
}
