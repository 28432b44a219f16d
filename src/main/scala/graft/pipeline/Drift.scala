package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift detection — the refresh-monitoring operator: given two
  * snapshots of a corpus (yesterday's crawl and today's, the pre- and
  * post-curation sets, a reference distribution and a live stream), how
  * far has each tracked column's distribution moved?
  *
  * Everything reduces to histograms, which is what makes the operator a
  * 100 TB citizen: one map-only bucketing pass per snapshot, one
  * map-side-combined `(column, bucket)` count aggregation whose result
  * is `columns × buckets` rows (KBs), and all divergence arithmetic on
  * that tiny frame. Nothing corpus-sized ever crosses a shuffle; the
  * reference histogram persists as a sidecar and a streaming probe
  * compares each micro-batch against it for pennies.
  *
  * Divergences, by exactness class (the repo's oracle discipline):
  *  - **Total variation distance** `0.5·Σ|p−q|` is emitted as the exact
  *    rational `tvd_num / tvd_den` in 64-bit integers
  *    (`Σ|cnt_r·N_c − cnt_c·N_r|` over `2·N_r·N_c`) — bit-replayable by
  *    any engine, valid while row counts stay below ~3·10^9 (the long
  *    budget of the cross product; `tvd` the double is computed from
  *    the same integers and serves beyond that).
  *  - **PSI** (population stability index, the industry drift score) and
  *    **Jensen–Shannon divergence** need logarithms, so they are
  *    API-level doubles with Laplace-0.5 smoothing — documented as
  *    approximate, never oracle-compared.
  *
  * Bucketing rules (each engine-replayable by construction):
  *  - numeric columns must be long-castable (lengths, token counts,
  *    timestamps — quantize real-valued metrics first); bin =
  *    `clamp(floor((x − lo)·bins / (hi − lo + 1)), 0, bins−1)` with
  *    `lo/hi` the REFERENCE snapshot's min/max, so current-side
  *    outliers clamp into the edge bins (their mass still registers as
  *    drift). The product `(x − lo)·bins` is exact in a double below
  *    2^53, and the division is IEEE — identical in any engine. NULL
  *    takes the dedicated `null` bucket, so null-rate drift is tracked
  *    like any other mass.
  *  - categorical columns bucket by value string (bounded domains:
  *    language, source, split). For UNBOUNDED domains (URLs, hosts) use
  *    [[Drift.hashedBucket]] — a 4-hex-digit md5 slice mod `buckets` —
  *    which bounds the histogram at the cost of measuring a PROJECTED
  *    drift (hash-bucket TVD lower-bounds true TVD; collisions can only
  *    cancel mass, never invent it).
  */
object Drift {

  /** Tracked column: `name` labels report rows; `expr` is the metric;
    * numeric specs carry `bins` (> 0) and bucket by the reference
    * min/max window; categorical specs set `bins = 0` and bucket by
    * value string.
    */
  final case class Spec(name: String, expr: Column, bins: Int) {
    def categorical: Boolean = bins == 0
  }

  def numeric(name: String, expr: Column, bins: Int = 16): Spec = {
    require(bins >= 2, s"numeric spec $name needs >= 2 bins")
    Spec(name, expr, bins)
  }

  def categorical(name: String, expr: Column): Spec = Spec(name, expr, 0)

  /** Bounded bucket for unbounded string domains: the first four hex
    * digits of md5 mod `buckets` — the same replayable slice the
    * Count-Min sketch uses ([[CountMin]]).
    */
  def hashedBucket(expr: Column, buckets: Int): Column =
    conv(substring(md5(expr.cast("string")), 1, 4), 16, 10)
      .cast("long") % buckets

  /** Null-safe bucket id (string) for one spec. Numeric: the integer
    * bin per the class rule; categorical: the value itself. NULL →
    * literal bucket `"null"` (numeric bins render as digits and
    * categorical real values could legitimately be "null", so
    * categorical NULL uses a `\u0000`-prefixed marker no real string
    * equals).
    */
  private def bucketOf(s: Spec, lo: Column, hi: Column): Column =
    if (s.categorical)
      coalesce(s.expr.cast("string"), lit("\u0000null"))
    else {
      val x = s.expr.cast("long")
      val bin = floor((x - lo).cast("double") * lit(s.bins.toDouble) /
        (hi - lo + lit(1L)).cast("double")).cast("long")
      when(x.isNull, lit("null"))
        .otherwise(greatest(lit(0L), least(lit(s.bins - 1L), bin))
          .cast("string"))
    }

  /** Reference min/max per numeric spec — one small aggregate row. */
  private def refBounds(ref: DataFrame, specs: Seq[Spec])
      : Map[String, (Long, Long)] = {
    val nums = specs.filterNot(_.categorical)
    if (nums.isEmpty) Map.empty
    else {
      val aggs = nums.flatMap(s => Seq(
        min(s.expr.cast("long")).as(s.name + "\u0000lo"),
        max(s.expr.cast("long")).as(s.name + "\u0000hi")))
      val row = ref.agg(aggs.head, aggs.tail: _*).collect()(0)
      nums.zipWithIndex.map { case (s, i) =>
        val lo = if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)
        val hi = if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1)
        s.name -> (lo, hi)
      }.toMap
    }
  }

  /** `(column, bucket, cnt)` histogram of every spec in ONE pass over
    * `df`: per row an array of (column, bucket) structs explodes into
    * the count aggregation, which combines map-side (bounded distinct
    * keys per the class doc).
    */
  def histogram(df: DataFrame, specs: Seq[Spec],
      bounds: Map[String, (Long, Long)]): DataFrame = {
    require(specs.nonEmpty, "at least one drift spec")
    val pairs = specs.map { s =>
      val (lo, hi) = if (s.categorical) (0L, 0L)
        else bounds.getOrElse(s.name,
          sys.error(s"no reference bounds for numeric spec ${s.name}"))
      struct(lit(s.name).as("column"),
        bucketOf(s, lit(lo), lit(hi)).as("bucket"))
    }
    df.select(explode(array(pairs: _*)).as("cb"))
      .groupBy(col("cb.column").as("column"), col("cb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Drift report between snapshots: one row per spec with
    * `(column, ref_rows, cur_rows, tvd_num, tvd_den, tvd, psi, jsd)`.
    * `tvd_num/tvd_den` are the exact-rational leg (see class doc);
    * `tvd`, `psi`, `jsd` are doubles for dashboards and thresholds.
    */
  def report(ref: DataFrame, cur: DataFrame, specs: Seq[Spec])
      : DataFrame =
    reportWithBounds(ref, cur, specs, refBounds(ref, specs))

  /** [[report]] with caller-supplied numeric windows instead of the
    * reference-scan min/max — the fully-declarative variant (no job at
    * plan-construction time), which is what the SQL table function
    * requires; also the right call when the window is a business
    * constant rather than a data property.
    */
  def reportWithBounds(ref: DataFrame, cur: DataFrame, specs: Seq[Spec],
      bounds: Map[String, (Long, Long)]): DataFrame = {
    val rh = histogram(ref, specs, bounds)
      .withColumnsRenamed(Map("cnt" -> "rc"))
    val ch = histogram(cur, specs, bounds)
      .withColumnsRenamed(Map("cnt" -> "cc"))
    joinedDivergences(rh, ch)
  }

  /** Divergence arithmetic over two `(column, bucket, rc|cc)` histogram
    * frames (tiny by construction — every op below is on KB-scale
    * data; broadcast joins throughout).
    */
  private[pipeline] def joinedDivergences(rh: DataFrame, ch: DataFrame)
      : DataFrame = {
    val joined = rh.join(ch, Seq("column", "bucket"), "full_outer")
      .select(col("column"), col("bucket"),
        coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    val totals = joined.groupBy("column")
      .agg(sum("rc").as("nr"), sum("cc").as("nc"),
        count(lit(1)).as("buckets"))
    val j = joined.join(broadcast(totals), Seq("column"))
    // smoothed probabilities for the log-based scores: Laplace 0.5 per
    // bucket over the UNION bucket set, so zero-mass buckets stay finite
    val p = (col("rc").cast("double") + lit(0.5)) /
      (col("nr").cast("double") + lit(0.5) * col("buckets"))
    val q = (col("cc").cast("double") + lit(0.5)) /
      (col("nc").cast("double") + lit(0.5) * col("buckets"))
    val m = (p + q) / lit(2.0)
    j.groupBy(col("column"))
      .agg(
        first(col("nr")).as("ref_rows"),
        first(col("nc")).as("cur_rows"),
        sum(abs(col("rc") * col("nc") - col("cc") * col("nr")))
          .as("tvd_num"),
        (lit(2L) * first(col("nr")) * first(col("nc"))).as("tvd_den"),
        sum((p - q) * (log(p) - log(q))).as("psi"),
        (sum(p * (log(p) - log(m))) / lit(2.0) +
          sum(q * (log(q) - log(m))) / lit(2.0)).as("jsd"))
      .withColumn("tvd",
        when(col("tvd_den") === 0L, lit(null).cast("double"))
          .otherwise(col("tvd_num").cast("double") /
            col("tvd_den").cast("double")))
      .select("column", "ref_rows", "cur_rows", "tvd_num", "tvd_den",
        "tvd", "psi", "jsd")
  }

  /** Row-level snapshot diff — the companion of the distribution-level
    * [[report]]: which documents were `added`, `removed`, `changed`
    * (same id, different content hash), or `unchanged` between two
    * snapshots. The join carries only `(id, md5)` — the
    * [[Refresh]] delta discipline — so the shuffle is hash-width no
    * matter how wide the rows are; at 100 TB this is one keyed
    * exchange of two id+hash projections. Output:
    * `(id, status)`; rows with a NULL id are ignored (a null id names
    * nothing — the pair-generator rule).
    */
  def corpusDiff(old: DataFrame, cur: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    def proj(df: DataFrame, h: String) = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        md5(col(contentCol).cast("string")).as(h))
    proj(old, "h_old").join(proj(cur, "h_new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, lit("added"))
          .when(col("h_new").isNull, lit("removed"))
          .when(col("h_old") === col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** [[corpusDiff]] rolled up to the audit row a refresh dashboard
    * wants: `(status, n)`.
    */
  def diffStats(old: DataFrame, cur: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    corpusDiff(old, cur, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** Persist the reference histogram (+ numeric bounds) as the sidecar
    * a streaming probe folds against: `path/hist` holds
    * `(column, bucket, cnt)`, `path/bounds` holds
    * `(column, lo, hi, bins)` for every numeric spec (categorical specs
    * carry no bounds row).
    */
  def writeReference(ref: DataFrame, specs: Seq[Spec], path: String)
      : Unit = {
    val spark = ref.sparkSession
    import spark.implicits._
    val bounds = refBounds(ref, specs)
    histogram(ref, specs, bounds).coalesce(1)
      .write.mode("overwrite").parquet(path + "/hist")
    specs.filterNot(_.categorical)
      .map(s => (s.name, bounds(s.name)._1, bounds(s.name)._2, s.bins))
      .toDF("column", "lo", "hi", "bins")
      .coalesce(1).write.mode("overwrite").parquet(path + "/bounds")
  }

  /** A reference sidecar pre-loaded for REPEATED probes (the streaming
    * monitor shape): the KB-sized histogram frame is cached and the
    * bounds table collected exactly once, so each micro-batch pays only
    * its own bucketing pass plus KB arithmetic — no sidecar re-read or
    * driver-side collect per batch.
    */
  final case class Reference private[pipeline] (rh: DataFrame,
      bounds: Map[String, (Long, Long)], bins: Map[String, Int])

  /** Load a persisted reference sidecar once ([[writeReference]]'s
    * layout) for any number of [[reportAgainstLoaded]] probes.
    * `cache = false` skips pinning the histogram frame — the one-shot
    * shape ([[reportAgainstReference]]) uses it so repeated day-2 calls
    * don't accumulate cached KB frames for the session.
    */
  def loadReference(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): Reference = {
    val rh0 = spark.read.parquet(path + "/hist")
      .withColumnsRenamed(Map("cnt" -> "rc"))
    val rh = if (cache) rh0.cache() else rh0
    val boundRows = spark.read.parquet(path + "/bounds").collect()
    Reference(rh,
      boundRows.map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap,
      boundRows.map(r => r.getString(0) -> r.getInt(3)).toMap)
  }

  /** Drift of `cur` against a pre-loaded reference. `specs` must name
    * the same columns the sidecar was built with (numeric bounds come
    * from the sidecar, NOT from `cur`, so the comparison window never
    * silently moves).
    */
  def reportAgainstLoaded(cur: DataFrame, specs: Seq[Spec],
      ref: Reference): DataFrame = {
    specs.filterNot(_.categorical).foreach { s =>
      require(ref.bins.get(s.name).contains(s.bins),
        s"spec ${s.name} bins=${s.bins} != sidecar " +
          s"bins=${ref.bins.getOrElse(s.name, "absent")}")
    }
    val ch = histogram(cur, specs, ref.bounds)
      .withColumnsRenamed(Map("cnt" -> "cc"))
    joinedDivergences(ref.rh, ch)
  }

  /** Drift of `cur` against a persisted reference sidecar — the one-shot
    * day-2 shape: the reference histogram is KBs, only `cur` is
    * scanned. Repeated probes should [[loadReference]] once instead.
    */
  def reportAgainstReference(cur: DataFrame, specs: Seq[Spec],
      path: String): DataFrame =
    reportAgainstLoaded(cur, specs,
      loadReference(cur.sparkSession, path, cache = false))
}
