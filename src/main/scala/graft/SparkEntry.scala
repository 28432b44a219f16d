package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: flatten customers through an evolved reader schema (alias
    * rename + promotion + default fill) and aggregate account balance per
    * segment — the engine's headline operator over real data.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = ops.FlattenOps.compile(Queries.customerWriter,
      Queries.customerReader).fold(e => sys.error(e), identity)
    c.flatten(spark.read.parquet(s"$dir/customer.parquet"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(floor(col("c_acctbal") * 100).cast("long")).as("acctbal_cents"))
      .orderBy("segment")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
