package graft.sinks

import graft.pipeline.BottomK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order) — the write-time operator
  * that makes a 100 TB table skippable on MORE THAN ONE predicate
  * column. A single `sortWithinPartitions(a)` gives parquet footers
  * tight min/max on `a` and useless full-range stats on every other
  * column; interleaving the bits of per-column rank buckets into one
  * Z-value and range-writing on it gives every listed column
  * partially-tight file stats, so a reader filtering on ANY of them
  * skips most files/row-groups at planning time.
  *
  * Scale design: bucket boundaries come from the deterministic
  * [[BottomK]] hash sample (k rows to the driver, bounded by
  * construction — never a full sort, never ingestion-biased like
  * `orderBy(id).limit(n)`); bucket assignment is one map-side fold over
  * the ≤255-element broadcast boundary array; the only shuffle is the
  * ONE `repartitionByRange` on the Z-value that any clustered write
  * needs. Bits-per-column is capped so the Z-value stays in a long.
  *
  * The written directory is plain parquet — no reader-side cooperation
  * needed: Spark's row-group stats pruning and any other parquet reader
  * benefit as-is. `zorder_roundtrip_orders` pins content equality
  * through the rewrite; LayoutSpec measures the actual file-skipping
  * evidence (footer min/max overlap fractions on BOTH columns vs a
  * single-column sort).
  */
object Layout {

  /** Monotone bucket id of `c` in [0, boundaries.size]: the number of
    * boundary values ≤ the cell value (NULLs → bucket 0, the parquet
    * null-stats convention keeps them skippable via null counts).
    */
  private def bucketOf(c: Column, boundaries: Seq[Double]): Column = {
    val bs = array(boundaries.map(lit): _*)
    when(c.isNull, lit(0L)).otherwise(
      aggregate(bs, lit(0L),
        (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L)))
  }

  /** Interleave the low `bits` bits of each bucket id: bit `j` of
    * column `i` lands at Z-bit `j * nCols + i` (column 0 owns the
    * least-significant lane). Pure long shifts — codegen'd.
    */
  private def zValue(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      (b, i) <- buckets.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(b, j).bitwiseAND(1L), j * n + i)
    terms.reduce(_ + _)
  }

  /** ALL columns' quantile boundaries from ONE bottom-k row sample of
    * the source (2^bits - 1 cuts per column; duplicate cuts are fine —
    * they merely merge adjacent buckets). One deterministic hash
    * sample keyed on the z-TUPLE serves every column — the pre-r13
    * shape ran one [[BottomK]] TakeOrderedAndProject scan PER column,
    * so a 3-column rewrite paid 3 boundary scans + the write scan; a
    * 100 TB layout rewrite notices. The sample is the [[BottomK]]
    * discipline (md5 order key, set-dedup, top-k heap + k-row driver
    * merge — never a full sort, never ingestion-biased); per-column
    * cut extraction is the same `floor(p * (n-1))` index rule as
    * [[BottomK.quantiles]], applied driver-side to the one collected
    * k-row sample (bounded by construction). NULL cells drop out of
    * their column's boundary estimate only ([[bucketOf]] routes NULLs
    * to bucket 0 regardless).
    */
  private[sinks] def boundariesForAll(df: DataFrame, zCols: Seq[String],
      bits: Int, sampleK: Int): Map[String, Seq[Double]] = {
    val cuts = (1 until (1 << bits)).map(_.toDouble / (1 << bits))
    // \u0001-separated so adjacent cells cannot re-segment into the
    // same key ("1","23" vs "12","3"): rows sharing h then share the
    // exact z-tuple, so the dedup's surviving row is value-identical
    val key = concat_ws("\u0001",
      zCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val sample = df
      .select((md5(key).as("h") +:
        zCols.map(c => col(c).cast("double").as(c))): _*)
      .dropDuplicates("h")
      .orderBy(col("h"))
      .limit(sampleK)
      .collect()
    zCols.zipWithIndex.map { case (c, i) =>
      val vs = sample.collect {
        case r if !r.isNullAt(i + 1) => r.getDouble(i + 1)
      }.sorted.toIndexedSeq
      val bounds =
        if (vs.isEmpty) Seq.empty[Double]
        else cuts.map(p => vs(math.floor(p * (vs.length - 1)).toInt))
      c -> (bounds: Seq[Double])
    }.toMap
  }

  /** Z-order `df` on `zCols` (numeric/castable-to-double columns) and
    * write parquet at `path`. `bits` rank bits per column (default 8 =
    * 256 buckets); `numFiles` output files (0 = the session's shuffle
    * parallelism). Returns the boundary table used, for audit.
    */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      bits: Int = 8, numFiles: Int = 0,
      sampleK: Int = 4096): Map[String, Seq[Double]] = {
    require(zCols.size >= 2,
      s"z-order needs >= 2 columns (one column wants a plain sort), " +
        s"got $zCols")
    require(bits >= 1 && bits * zCols.size <= 62,
      s"bits=$bits x ${zCols.size} cols overflows the long Z-value")
    require(numFiles >= 0, s"numFiles $numFiles < 0")
    val spark = df.sparkSession
    val bounds = boundariesForAll(df, zCols, bits, sampleK)
    val z = zValue(zCols.map(c => bucketOf(col(c), bounds(c))), bits)
    val parts = if (numFiles > 0) numFiles
      else spark.sessionState.conf.numShufflePartitions
    df.withColumn("_z", z)
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    bounds
  }
}
