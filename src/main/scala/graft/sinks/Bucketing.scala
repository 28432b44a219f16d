package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the storage-side
  * answer to the biggest recurring shuffle at 100 TB: two fact tables
  * joined on the same key every day pay a full exchange of both sides
  * on every run unless their layout already agrees with the join.
  * Writing both sides bucketed (and sorted) by the join key lets
  * Spark's bucketed scan hand the join pre-partitioned, pre-sorted
  * input: the sort-merge join runs with NO Exchange and NO per-task
  * sort — the shuffle was paid once at write time and amortizes over
  * every subsequent join (`BucketingSpec` pins the exchange-free plan).
  *
  * Notes for the 100 TB deployment:
  *  - both sides must agree on bucket COUNT and key; bucket count is
  *    part of the table contract, size it to the LARGER table's growth
  *    (buckets cannot be renumbered without a rewrite);
  *  - bucketing metadata lives in the catalog, so readers must go
  *    through `spark.table(name)`, not `spark.read.parquet(path)` —
  *    a path read silently loses the layout and reintroduces the
  *    exchange;
  *  - each writing task emits one file per bucket it touches, so
  *    repartition by the bucket key first (done below) to keep file
  *    counts at `nBuckets`, not `tasks × nBuckets`.
  */
object Bucketing {

  /** Write `df` as an EXTERNAL parquet table at `path`, bucketed and
    * sorted by `keys` into `nBuckets`. Replaces any existing table
    * registration of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], nBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucket keys must be non-empty")
    require(nBuckets > 0, "nBuckets must be > 0")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, keys.map(df.col): _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their shared bucket keys. Plain
    * `spark.table` + equi-join — the value is the layout, not the
    * operator; exposed so call sites read as intent.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
