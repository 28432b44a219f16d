package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling by CONTENT HASH — the
  * train/val/test primitive a 100 TB training pipeline needs: the
  * assignment is a pure function of the key bytes (first 16 bits of
  * md5, compared as hex text), so it is reproducible across re-runs,
  * repartitioning, cluster sizes, and even engines (any system with
  * md5 computes the identical split — the oracle checks exactly this),
  * and membership never flips when unrelated rows are added or removed
  * (`randomSplit` guarantees none of these: it is seed- AND
  * partitioning-dependent).
  *
  * Granularity is 1/65536 per threshold (4 hex chars): fractions are
  * honored to ±0.002%, plenty for split purposes; the comparison stays
  * on lowercase-hex TEXT (digits sort before 'a'..'f' in ASCII), so no
  * engine-specific hex→int conversion is involved anywhere.
  */
object Sampling {

  /** Format a cumulative fraction as its 4-hex-char cutoff; 1.0 maps to
    * "g", which sorts above every hex string, so a full split/sample
    * includes the `ffff` bucket too.
    */
  private def cutoffHex(cum: Double): String = {
    require(cum >= 0 && cum <= 1, s"fraction bound $cum outside [0,1]")
    if (cum >= 1.0) "g" else f"${(cum * 65536L).toLong}%04x"
  }

  /** The 4-hex-char md5 prefix the split comparisons run on. A NULL key
    * hashes as the EMPTY key (bucket `d41d`): one uniform, deterministic
    * rule for both [[hashSplit]] and [[hashSample]] — without it, nulls
    * would fall to the last split label but silently VANISH from a
    * 100% sample (null comparisons propagate).
    */
  private def bucket(key: Column): Column =
    substring(md5(coalesce(key.cast("binary"),
      lit(Array.emptyByteArray))), 1, 4)

  /** Full-width deterministic hash ORDER key (32-hex md5 of the key's
    * string rendering; null keys hash as the empty string — the
    * [[permutationColumn]] null rule, usable with keys of ANY type
    * where the binary-cast bucket rule accepts only strings):
    * `orderBy(hashOrderKey(k), k).limit(n)` draws a uniform n-row
    * sample corpus-wide with a top-n heap (TakeOrderedAndProject — no
    * count pass, no full sort) and no ingestion-order bias, the defect
    * of `orderBy(id).limit(n)` when ids correlate with ingestion time.
    * The 4-char bucket is too coarse as an order key: at 1e9 rows one
    * bucket holds ~15k rows, so a 10k sample would fall inside a single
    * bucket and re-inherit the id tiebreak's ingestion order.
    */
  def hashOrderKey(key: Column): Column =
    md5(coalesce(key.cast("string"), lit("")))

  /** Split-label Column for `key`: `splits` are (label, fraction) in
    * declared order, fractions summing to 1 (±1e-9). Row → label is
    * deterministic in the key bytes alone.
    */
  def hashSplitColumn(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 >= 0), "fractions must be non-negative")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $total")
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val b = bucket(key)
    // last split takes everything remaining — no float-edge gap
    splits.init.zip(cums.init).foldRight(
        lit(splits.last._1): Column) { case (((label, _), cum), rest) =>
      when(b < lit(cutoffHex(cum)), lit(label)).otherwise(rest)
    }
  }

  /** `df` plus a `split` column assigning each row its deterministic
    * partition label.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", hashSplitColumn(col(keyCol), splits))

  /** Deterministic ~`frac` sample of `df` by the same content-hash rule:
    * the SAME rows are kept on every run, and a row's membership never
    * changes when other rows come or go (unlike `df.sample`). Fraction
    * granularity 1/65536.
    */
  def hashSample(df: DataFrame, keyCol: String, frac: Double): DataFrame =
    df.filter(hashSampleColumn(col(keyCol), frac))

  /** The boolean membership predicate behind [[hashSample]] — exposed so
    * the SQL surface (`graft_keep_sample`) shares the exact rule.
    */
  def hashSampleColumn(key: Column, frac: Double): Column = {
    require(frac >= 0 && frac <= 1, s"fraction $frac outside [0,1]")
    bucket(key) < lit(cutoffHex(frac))
  }

  /** STRATIFIED deterministic sample: per-stratum keep fractions (e.g.
    * rebalancing languages or quality buckets while downsampling), same
    * content-hash membership rule per row. `fractions` maps stratum
    * value → fraction; strata absent from the map keep `defaultFrac`
    * (0 = drop unlisted strata). Still a pure per-row predicate — no
    * `sampleBy`-style per-stratum RNG, no shuffle, map-only at 100 TB,
    * and membership is reproducible across runs/engines per stratum.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
      stratumCol: String, fractions: Map[String, Double],
      defaultFrac: Double = 0.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFrac).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction $f outside [0,1]"))
    val b = bucket(col(keyCol))
    val pred = fractions.foldRight(
        b < lit(cutoffHex(defaultFrac)): Column) {
      case ((stratum, frac), rest) =>
        when(col(stratumCol) === lit(stratum),
          b < lit(cutoffHex(frac))).otherwise(rest)
    }
    df.filter(pred)
  }

  // ------------------------------------------------ domain mixture
  // A training corpus is REWEIGHTED before sampling: each domain (source,
  // crawl, language...) gets a target share of the token budget, and the
  // per-domain keep fraction follows from what that domain actually has.
  // The fraction math is engine-portable by construction: the scale
  // factor 65536 is 2^16, so `fraction * 65536` is EXACT in IEEE doubles
  // (exponent shift, no rounding) and the bucket cutoff is fully
  // determined by the one double division `weight*budget/available` —
  // identical hardware-IEEE in any engine that replays it.

  /** Per-domain sampling plan for a token-budget mixture: for each
    * domain present in BOTH `df` and `weights`, its `available_tokens`
    * (sum of `tokens`), `target_tokens` (floor of weight*budget), and
    * `cutoff_bucket` = floor(min(1, target/available) * 65536) — the
    * [[hashSample]] bucket cutoff in 1/65536 granularity units, 65536
    * meaning keep-all (the domain is under-represented vs its target
    * and saturates; upsampling is out of scope). One aggregation keyed
    * by domain — domain cardinality, not corpus size. Domains carrying
    * weight but absent from `df` produce no row (nothing to sample),
    * and so do domains whose `available_tokens` sums to ZERO — without
    * that filter the cutoff arithmetic divides by zero (null under
    * Spark's non-ANSI divide), `least` skips the null, and the plan
    * would silently emit keep-all for a domain with nothing to give;
    * weights are relative to `tokenBudget`, callers usually pass a set
    * summing to 1.
    */
  def mixturePlan(df: DataFrame, domainCol: String, tokens: Column,
      weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    require(weights.nonEmpty, "at least one domain weight")
    weights.foreach { case (d, w) =>
      require(w >= 0, s"weight $w for domain '$d' must be >= 0") }
    require(tokenBudget >= 0, s"tokenBudget $tokenBudget must be >= 0")
    val weightCol = weights.foldRight(lit(null).cast("double")) {
      case ((d, w), rest) =>
        when(col("domain") === lit(d), lit(w)).otherwise(rest)
    }
    val frac = least(lit(1.0),
      col("weight") * lit(tokenBudget) / col("available_tokens"))
    df.groupBy(col(domainCol).as("domain"))
      .agg(sum(tokens).cast("long").as("available_tokens"))
      .withColumn("weight", weightCol)
      .filter(col("weight").isNotNull &&
        col("available_tokens") > 0)
      .withColumn("target_tokens",
        floor(col("weight") * lit(tokenBudget)).cast("long"))
      .withColumn("cutoff_bucket",
        floor(frac * lit(65536)).cast("long"))
      .drop("weight")
  }

  /** Deterministic mixture sample: keep each domain at the
    * [[mixturePlan]] fraction, by the same content-hash membership rule
    * as [[hashSample]] (same rows on every run; a row's membership
    * never changes when other rows come or go). Domains without a
    * weight are DROPPED. The plan aggregation runs once and collects
    * domain-count rows to the driver (small by contract — mixtures have
    * tens of domains, not millions); the sample itself is a pure
    * map-side predicate, no shuffle at any scale.
    */
  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
      tokens: Column, weights: Map[String, Double],
      tokenBudget: Long): DataFrame = {
    val plan = mixturePlan(df, domainCol, tokens, weights, tokenBudget)
      .select("domain", "cutoff_bucket").collect()
    // bucket/65536.0 is exact (power-of-two divide), and cutoffHex
    // round-trips it to the identical bucket — one rule, one spelling
    val fractions = plan.map(r =>
      r.getString(0) -> r.getLong(1) / 65536.0).toMap
    stratifiedHashSample(df, keyCol, domainCol, fractions,
      defaultFrac = 0.0)
  }

  // ------------------------------------------------ training order
  // "Shuffle the corpus" is the last step before a training job reads
  // it: the order must be pseudo-random (no domain/time clumping), yet
  // reproducible across re-runs, cluster sizes, AND engines — which
  // rules out `orderBy(rand(seed))` (partitioning-dependent) exactly
  // like `randomSplit` was ruled out above. Same discipline as the
  // split rule: the order key is md5 of (seed ':' content key), so any
  // system with md5 derives the identical permutation.

  /** The engine-portable permutation key: lowercase-hex
    * `md5(seed ':' key)`. A NULL key hashes as the empty string (the
    * [[hashSplit]] null rule — one uniform convention), so every row
    * gets a non-null order key and no engine-specific null-sort
    * divergence can enter.
    */
  def permutationColumn(key: Column, seed: String): Column =
    md5(concat(lit(seed), lit(":"),
      coalesce(key.cast("string"), lit(""))))

  /** `df` + `_order` — sort by it for the deterministic shuffled
    * training order. Map-only; the sort belongs to the consumer (or to
    * [[permutedShards]], which pays the one range shuffle and hands
    * back contiguous equal-row shards).
    */
  def permuted(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("_order", permutationColumn(col(keyCol), seed))

  /** Shuffle-then-shard in ONE range exchange: rows ordered by the
    * md5 permutation, packed into contiguous shards of exactly
    * `rowsPerShard` rows (last shard ragged) — the
    * [[Sharding.shardByTokenBudget]] two-level prefix sum with UNIT
    * tokens, so shard boundaries are row counts and the whole step
    * costs the single unavoidable global-order shuffle. Output:
    * `df` + `_order` + `_tokens`(=1) + `shard` (long). A training
    * reader consumes `shard=N` directories in order via
    * [[Sharding.writeShards]].
    */
  def permutedShards(df: DataFrame, keyCol: String, seed: String,
      rowsPerShard: Long, numPartitions: Int = 0): DataFrame =
    Sharding.shardByTokenBudget(permuted(df, keyCol, seed), "_order",
      lit(1L), rowsPerShard, numPartitions)

  /** Deterministic WEIGHTED sample without replacement: the
    * Efraimidis–Spirakis A-Res rule (Inf. Process. Lett. 97(5), 2006 —
    * public literature) — each row draws a reproducible uniform
    * `u ∈ (0,1]` from its key and seed, takes rank key `ln(u)/w`, and
    * the top-`n` rank keys win; inclusion probability is proportional
    * to weight, and the whole draw is one top-n heap
    * (TakeOrderedAndProject), no full sort, no count pass.
    *
    * Determinism/replay design: `u` is the first 13 md5 hex digits as
    * an integer over `16^13` — a 52-bit dyadic rational, exactly
    * representable and identical in any engine (`+1` keeps it nonzero:
    * `ln(0)` is −∞ and would make zero-weight ties engine-ordered).
    * `ln` itself is correctly-rounded-ish but not bit-guaranteed across
    * engines, so the rank key may differ in the last ulp — the
    * ORDERING, which is all the sample uses, is stable because
    * md5-derived keys are spread (gaps ~1/n², 10^8 ulps at any
    * realistic n); ties break by the key column. Weights must be
    * strictly positive (zero/negative/NULL weights are refused rows —
    * filtered out, like null ids in the pair generators).
    *
    * @param n     sample size (kept exactly, unless fewer rows qualify)
    * @param seed  draw namespace — a different seed is a fresh draw
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      n: Int, seed: String = ""): DataFrame = {
    require(n >= 1, s"sample size $n must be >= 1")
    val u = (conv(substring(md5(concat(lit(seed),
        coalesce(col(keyCol).cast("string"), lit("")))), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(math.pow(16.0, 13))
    val rank = log(u) / weight.cast("double")
    df.filter(weight.isNotNull && weight > 0)
      .withColumn("_wrank", rank)
      .orderBy(desc("_wrank"), col(keyCol))
      .limit(n)
      .drop("_wrank")
  }

  /** Frequency cap: keep at most `cap` rows per key, chosen as the
    * FIRST `cap` by `orderCol` ascending (ties broken by `orderCol`
    * itself, so the order column must be unique per key — a doc id
    * qualifies). The domain-diversity stage of the published web-corpus
    * recipes: no single host/source may dominate the mixture.
    *
    * Skew design (the whole point at 100 TB — a hot domain holds
    * billions of rows): a plain per-key window sorts every hot key's
    * rows in ONE reducer. Instead the cap runs in two exact phases:
    *   1. salt each row by hash(order) into `salts` buckets; rank
    *      within (key, salt) and keep rank <= cap — at most
    *      `salts × cap` survivors per key, each bucket ~1/salts of the
    *      hot key;
    *   2. rank the bounded survivor set within key and keep rank <=
    *      cap.
    * Phase 1 can never evict a final top-`cap` row (a row's rank in
    * its salt bucket is <= its rank in the whole key), so the result
    * is EXACTLY the unsalted window's — the standard distributed
    * top-k argument, applied per key.
    */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String,
      cap: Int, salts: Int = 16): DataFrame = {
    require(cap >= 1 && salts >= 1, s"cap $cap / salts $salts must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val salt = pmod(xxhash64(col(orderCol)), lit(salts)).as("_salt")
    val w1 = Window.partitionBy(col(keyCol), col("_salt"))
      .orderBy(col(orderCol))
    val survivors = df.withColumn("_salt", salt)
      .withColumn("_r", row_number().over(w1))
      .filter(col("_r") <= cap)
      .drop("_salt", "_r")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    survivors.withColumn("_r", row_number().over(w2))
      .filter(col("_r") <= cap)
      .drop("_r")
  }
}
