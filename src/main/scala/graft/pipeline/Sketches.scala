package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, via
  * Spark's native `hll_sketch_agg` family) with a persisted sidecar —
  * corpus-wide cardinality statistics that UPDATE at daily-batch cost:
  * sketch the batch, union it into the stored sketches, never rescan
  * the corpus. The union's REGISTER state is a pointwise max —
  * deterministic, associative, idempotent — but DataSketches' ESTIMATOR
  * choice is path-dependent (HIP accumulator carries through sparse
  * coupon replays, the composite estimator takes over after a dense
  * merge), so estimates across different batchings of the same corpus
  * agree to a tight envelope rather than bit-exactly, and re-folding an
  * already-folded batch is EXACTLY a no-op (its coupons are all known —
  * nothing in the state moves). SketchesSpec and the oracle row pin
  * precisely these claims, plus the lgK error envelope vs exact counts.
  *
  * Scale design: one aggregate over one scan (the [[Profile]] shape);
  * each partition reduces to `lgK`-bounded sketch bytes, the shuffle
  * carries one row per partition, and the sidecar is KB-sized per
  * column. Values are sketched through `cast(string)` so a column's
  * identity is its rendered value — stable across batches and column
  * physical types.
  */
object Sketches {

  /** One HLL sketch per listed column, as `(col_name, sketch)` rows. */
  def columnSketches(df: DataFrame, cols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "no columns to sketch")
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      hll_sketch_agg(col(c).cast("string"), lit(lgK)).as(s"_s$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacks = cols.zipWithIndex.map { case (c, i) => s"'$c', _s$i" }
    one.select(expr(s"stack(${cols.length}, ${stacks.mkString(", ")}) " +
      "AS (col_name, sketch)"))
  }

  /** Persist column sketches + their operating point (`lgK`, columns). */
  def writeSketches(df: DataFrame, cols: Seq[String], path: String,
      lgK: Int = 12): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    columnSketches(df, cols, lgK).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sketches")
    Seq((lgK, cols.mkString(","))).toDF("lgK", "cols").coalesce(1)
      .write.mode("overwrite").json(s"$path/params")
  }

  /** Fold a new batch into the stored sketches — batch-sized cost, no
    * corpus rescan. The batch is sketched at the sidecar's STORED lgK
    * (part of the sketch identity, like index params), unioned per
    * column, and the sidecar rewritten. The merged rows are collected
    * before the overwrite — one row per column, KB each, bounded by
    * construction — because overwriting a path that the writing plan
    * still reads lazily would race itself.
    */
  def updateSketches(spark: SparkSession, path: String,
      batch: DataFrame): Unit = {
    val p = spark.read.json(s"$path/params").head()
    val lgK = p.getAs[Long]("lgK").toInt
    val cols = p.getAs[String]("cols").split(",").toSeq
    val merged = spark.read.parquet(s"$path/sketches")
      .union(columnSketches(batch, cols, lgK))
      .groupBy("col_name")
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"))
    val rows = java.util.Arrays.asList(merged.collect(): _*)
    spark.createDataFrame(rows, merged.schema).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/sketches")
  }

  /** Distinct-count estimates from a persisted sidecar. */
  def estimates(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketches")
      .select(col("col_name"),
        hll_sketch_estimate(col("sketch")).as("n_distinct_est"))
}
